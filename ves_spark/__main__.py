"""spark-submit entry point:

    spark-submit --py-files ves_spark.zip -m ves_spark  # or:
    spark-submit --py-files ves_spark.zip ves_spark/__main__.py \\
        --sequences s3://.../sequences \\
        --source-meta s3://.../source_meta \\
        --route-rules s3://.../route_rules \\
        --out s3://.../out --units 1024 --units-per-increment 64

On a cluster, master/executor settings come from spark-submit; this
module only supplies SQL confs (see session.get_spark). Locally it
falls back to local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json
import uuid

from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.session import get_spark


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="ves_spark")
    p.add_argument("--sequences", required=True)
    p.add_argument("--source-meta", required=True)
    p.add_argument("--route-rules", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--units", type=int, default=64)
    p.add_argument("--units-per-increment", type=int, default=8)
    p.add_argument("--parse-impl", choices=["builtin", "arrow"], default="builtin")
    p.add_argument(
        "--no-recursive",
        action="store_true",
        help="scan only the top level of the input directory (the "
        "reference's `recursive: false`; default walks nested dirs)",
    )
    p.add_argument("--write-partitions", type=int, default=0)
    p.add_argument(
        "--target-file-bytes",
        type=int,
        default=0,
        help="if > 0, cap each routed output file near this many "
        "on-disk bytes (maxRecordsPerFile from a once-per-run "
        "bytes/row probe); 0 = uncapped",
    )
    p.add_argument(
        "--dedup-content",
        action="store_true",
        help="exactly-once by token-array content across batches: "
        "docs whose content was already routed by a committed "
        "increment are dropped (keeper = lowest (unit, doc_id))",
    )
    p.add_argument("--run-id", default=None)
    p.add_argument(
        "--prefer-iceberg",
        action="store_true",
        help="use the Iceberg catalog when the runtime jar is present",
    )
    p.add_argument(
        "--catalog",
        choices=["parquet", "snapshot", "iceberg", "auto"],
        default=None,
        help="table-format backend: parquet dirs, the local snapshot "
        "catalog (Iceberg semantics without the jar, see ICEBERG.md), "
        "real Iceberg, or auto (iceberg if available); overrides "
        "--prefer-iceberg",
    )
    p.add_argument(
        "--lineage-compact-every",
        type=int,
        default=64,
        help="fold lineage commit files into one compacted parquet "
        "when the live file count reaches this",
    )
    p.add_argument(
        "--watch-interval",
        type=float,
        default=0.0,
        help="if > 0, keep rescanning the input every N seconds and "
        "processing newly appended files (the reference's discovery "
        "loop); 0 = single pass",
    )
    p.add_argument(
        "--alerts",
        action="store_true",
        help="after the run, score the finalized rollup with the "
        "trailing-baseline spike/drop detector (gap-filled) and write "
        "the flagged buckets to <out>/alerts",
    )
    p.add_argument(
        "--alert-lookback",
        type=int,
        default=12,
        help="trailing baseline length in buckets for --alerts",
    )
    args = p.parse_args(argv)

    # get_spark is getOrCreate: when a caller (tests, a notebook)
    # already owns a session, reuse it and DON'T stop it on exit —
    # killing a borrowed SparkContext breaks the caller
    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="ves_spark_pipeline")
    conf = PipelineConfig(
        sequences_path=args.sequences,
        source_meta_path=args.source_meta,
        route_rules_path=args.route_rules,
        out_dir=args.out,
        n_units=args.units,
        units_per_increment=args.units_per_increment,
        parse_impl=args.parse_impl,
        recursive=not args.no_recursive,
        write_partitions=args.write_partitions,
        target_file_bytes=args.target_file_bytes,
        dedup_content=args.dedup_content,
        run_id=args.run_id or f"run-{uuid.uuid4().hex[:8]}",
        prefer_iceberg=args.prefer_iceberg,
        catalog_impl=args.catalog,
        lineage_compact_every=args.lineage_compact_every,
    )
    pipe = Pipeline(spark, conf)
    stats = pipe.run()
    print(json.dumps(stats))
    if args.alerts:
        from ves_spark.operators.anomaly import detect_rate_spikes
        from ves_spark.parse import TIME_BUCKET_MINUTES

        scored = detect_rate_spikes(
            pipe.finalize_rollup(),
            ["sink", "source"],
            time_col="time_bucket",
            value_col="cnt",
            lookback=args.alert_lookback,
            bucket_width=TIME_BUCKET_MINUTES * 60,
            fill_gaps=True,
        )
        flagged = scored.filter("is_spike OR is_drop")
        flagged.write.mode("overwrite").parquet(f"{args.out}/alerts")
        print(json.dumps({"alerts": flagged.count()}))
    if args.watch_interval > 0:
        # the reference's rescan loop (discovery.rs:56-87): discover()
        # assigns any newly appeared files to a fresh ingest batch and
        # run() processes exactly that
        import time as _time

        while True:
            _time.sleep(args.watch_interval)
            stats = pipe.run()
            if stats["units_processed"]:
                print(json.dumps(stats))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
