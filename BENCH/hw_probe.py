#!/usr/bin/env python
"""Hardware thread-scaling control — NO Spark, NO JVM (round-3 verdict
ask #2: attribute the compute-bound probe's 8->32 shortfall).

The Spark compute probe (compute_probe.py) showed ~0.74 efficiency at
8->32 threads even with memory traffic ruled out. Before blaming the
Spark stack (scheduler, task dispatch, GC), measure what the BOX gives
pure CPU work at the same two concurrency levels: N independent OS
processes (no GIL, no shared state), each running an identical
integer-hash kernel over a 4 KiB in-L1 numpy buffer — zero memory-bus
traffic, zero synchronization, zero runtime above the OS scheduler.

If this probe also loses ~25% at 8->32, the loss is the machine
(all-core turbo / hypervisor scheduling on a 32-vCPU guest), not
Spark — per-core clock on shared cloud hardware drops as more cores go
busy, which a real N->4N *cluster* scale-out does not suffer (4N
executors on 4x the hosts keep per-core clocks constant).

Prints one JSON line:
  {"procs": {"8": gops, "32": gops}, "eff_8_32": r, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np  # imported BEFORE the fork: workers inherit the
                    # loaded module, so per-process import time never
                    # lands inside the measured window

LANES = 1024  # 8 KiB of uint64 — deep in L1 (1024 lanes x 8 B)
ITERS = int(os.environ.get("VES_HW_ITERS", "400000"))
LEVELS = [8, 32]
REPS = int(os.environ.get("VES_HW_REPS", "3"))


def _kernel(_: int) -> float:
    """Fixed work: ITERS rounds of a splitmix-ish mix over LANES
    uint64 lanes. Returns the wall seconds this worker spent."""
    a = np.arange(LANES, dtype=np.uint64)
    c1 = np.uint64(0x9E3779B97F4A7C15)
    c2 = np.uint64(0xBF58476D1CE4E5B9)
    s30 = np.uint64(30)
    s27 = np.uint64(27)
    t0 = time.monotonic()
    for _ in range(ITERS):
        a = a + c1
        a = (a ^ (a >> s30)) * c2
        a = a ^ (a >> s27)
    if int(a[0]) == 42:  # defeat any dead-code elimination
        print("", end="")
    return time.monotonic() - t0


def measure(nproc: int) -> float:
    """Aggregate Gops/s with nproc simultaneous worker processes."""
    with mp.get_context("fork").Pool(nproc) as pool:
        t0 = time.monotonic()
        pool.map(_kernel, range(nproc), chunksize=1)
        wall = time.monotonic() - t0
    ops = nproc * ITERS * LANES
    return ops / wall / 1e9


def main() -> None:
    best: dict[int, float] = {}
    for _ in range(REPS):
        for n in LEVELS:
            g = measure(n)
            best[n] = max(best.get(n, 0.0), g)
    eff = (best[32] / best[8]) / 4
    print(
        json.dumps(
            {
                "metric": "pure-process integer-hash throughput (no JVM)",
                "gops": {str(k): round(v, 2) for k, v in best.items()},
                "eff_8_32": round(eff, 3),
                "lanes": LANES,
                "iters": ITERS,
            }
        )
    )


if __name__ == "__main__":
    main()
