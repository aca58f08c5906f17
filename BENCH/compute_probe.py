#!/usr/bin/env python
"""Compute-bound thread-scaling probe (round-2 verdict ask #8).

The end-to-end pipeline's 8->32 efficiency on this box is limited by
the shared memory bus (8 threads already draw ~90% of the ~99 GB/s the
box can serve — see copy_bandwidth in run_scaling.py). The claim "the
shortfall is the bus, not the job or Spark" needs a control: the SAME
Spark runtime at the same two parallelism levels on a job with near-
zero memory traffic. This probe is that control — a whole-stage-
codegen'd xxhash64 chain over spark.range (generated, never
materialized; working set = a handful of longs per task), so it
measures pure CPU thread-scaling through the entire Spark stack
(scheduler, codegen, task dispatch) with the bus out of the picture.

Run as a subprocess per level (one JVM per parallelism level, like
bench.py):  SPARK_GRAFT_CPUS=8 python BENCH/compute_probe.py
Prints one JSON line: {"cpus": 8, "wall_sec": ..., "ghash_s": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("VES_PROBE_ROWS", str(2_000_000_000)))
# 8 chained hashes keeps the generated project method small enough for
# the JIT (measured: 48 nested xxhash64 calls trip hugeMethodLimit and
# run ~10x slower as interpreted bytecode, corrupting the measurement)
ROUNDS = int(os.environ.get("VES_PROBE_ROUNDS", "8"))


def main() -> None:
    from pyspark.sql import functions as F

    from ves_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)

    def job():
        # a FRESH DataFrame per run with IDENTICAL literals:
        # re-collecting one DF instance reuses its AQE-materialized
        # shuffle output and returns in milliseconds without
        # recomputing (measured), while changing a literal forces a
        # codegen recompile + cold JIT every run, biasing short walls
        # (measured ~10% on the 32-thread run). A fresh DF instance
        # rebuilds the RDD lineage (full recompute) but hits the
        # compiled-class cache, keeping the JIT hot.
        col = F.col("id")
        for _ in range(ROUNDS):
            col = F.xxhash64(col)
        # bit_xor, not sum: summing billions of pseudo-random longs
        # overflows (ANSI mode throws); xor folds them overflow-free
        return (
            spark.range(0, ROWS, 1, numPartitions=cpus * 4)
            .select(col.alias("h"))
            .agg(F.expr("bit_xor(h)").alias("s"))
        )

    job().collect()  # warmup: JIT + codegen compile
    walls = []
    res = None
    for _ in range(3):
        t0 = time.monotonic()
        res = job().collect()[0]["s"]
        walls.append(time.monotonic() - t0)
    wall = min(walls)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "rows": ROWS,
                "rounds": ROUNDS,
                "wall_sec": round(wall, 3),
                "ghash_s": round(ROWS * ROUNDS / wall / 1e9, 3),
                "checksum": int(res),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
