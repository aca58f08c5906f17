#!/usr/bin/env python
"""Opportunistic scaling-sample collector.

This host's page/steal throughput oscillates between fast (~GB/s) and
slow (~35 MB/s) phases lasting tens of minutes; benches run in a slow
phase record junk lows that waste the measurement budget (the max-over-
samples estimator discards them, but the wall-clock is gone). This
gate measures host memcpy speed first and only benches when the box is
in a fast phase.

Usage:  python BENCH/take_sample.py <cpus> [min_gbs]
Exits 1 without benching if the host is slow; on success appends one
sha-tagged sample to BENCH/scaling_history.jsonl (same format as
run_scaling.py).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "BENCH"))


def host_copy_gbs(gib: float = 1.0, threads: int = 16) -> float:
    import numpy as np

    n = int(gib * (1 << 30))
    src = np.zeros(n, dtype=np.uint8)
    dst = np.zeros(n, dtype=np.uint8)
    s, d = src.ctypes.data, dst.ctypes.data
    st = (n + threads - 1) // threads
    t0 = time.monotonic()
    with ThreadPoolExecutor(threads) as ex:
        list(
            ex.map(
                lambda i: ctypes.memmove(d + i * st, s + i * st, min(st, n - i * st)),
                range(threads),
            )
        )
    return 2 * n / (time.monotonic() - t0) / (1 << 30)


def main() -> int:
    from run_scaling import _code_sha  # sha-scoped, same as the harness

    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    min_gbs = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    gbs = host_copy_gbs()
    if gbs < min_gbs:
        print(f"host slow ({gbs:.1f} GB/s fresh-page copy < {min_gbs}); skipping")
        return 1
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        VES_BENCH_ROWS="16000000",
        VES_BENCH_QUERIES="none",
    )
    if cpus <= 2:
        # ~70 s per run at 2 threads: a smaller rep budget fits the
        # fast-phase window; max-over-invocations compensates
        env.update(VES_BENCH_MAX_WARMUPS="1", VES_BENCH_TIMED_RUNS="2")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=540,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    d = {
        "ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "sha": _code_sha(),
        "cpus": cpus,
        "rows": 16000000,
        "thr_mseq_s": r["throughput_mseq_per_sec"],
        "wall_sec": r["value"],
    }
    with open(os.path.join(REPO, "BENCH", "scaling_history.jsonl"), "a") as f:
        f.write(json.dumps(d) + "\n")
    print(json.dumps(d))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
