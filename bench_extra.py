#!/usr/bin/env python
"""Extra benchmark harness for optimization work (guide §1.4): noop-sink
per-query timing + .explain("formatted") capture, without touching the
frozen bench.py. Prints one JSON line per query.

Usage:
  python bench_extra.py [--sf DIR] [--runs N] [--plans OUTDIR] q1 q2 ...
  python bench_extra.py --all            # every registered query

Environment mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir for <name>_<tag>.txt plans")
    ap.add_argument("--plan-tag", default="before")
    args = ap.parse_args()

    from ves_spark import queries as qmod
    from ves_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="ves_bench_extra",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
            "spark.driver.extraJavaOptions": "-XX:+AlwaysPreTouch",
        },
    )
    registry = qmod.queries()
    names = sorted(registry) if args.all else args.names
    out = {}
    for name in names:
        if name not in registry:
            print(f"## unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        try:
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                df = registry[name](spark, args.sf)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.plans, f"{name}_{args.plan_tag}.txt"), "w"
                ) as f:
                    f.write(plan)
            walls = []
            for _ in range(args.runs):
                t0 = time.monotonic()
                df = registry[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                walls.append(round(time.monotonic() - t0, 3))
            out[name] = min(walls)
            print(json.dumps({"query": name, "min": min(walls), "walls": walls}))
        except Exception as ex:
            out[name] = f"error: {type(ex).__name__}: {ex}"
            print(json.dumps({"query": name, "error": str(ex)[:500]}))
        finally:
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
