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

Post-run product legs (each runs after the initial pass AND after
every --watch-interval rescan that processed new units, so watch mode
never serves stale tables):

* --alerts   : trailing-baseline spike/drop detector over the
               finalized rollup -> <out>/alerts
* --drift    : PSI of the newest ingest batch's routed distribution
               vs all prior batches' -> <out>/drift (the reference's
               per-source marginals across snapshots,
               src/tailer/manager.rs:21-29, compared between epochs)
* --assemble : dataset assembly over the routed table — deterministic
               shuffle -> sequence packing -> train/val/test split ->
               <out>/assembly (partitioned by _split; the declared-but-absent
               normalization/export stage, src/tailer/manager.rs:28-29)
"""

from __future__ import annotations

import argparse
import json
import uuid

from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.session import get_spark


def _write_alerts(pipe: Pipeline, args) -> dict:
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
    return {"alerts": flagged.count()}


def _write_drift(spark, pipe: Pipeline, args) -> dict:
    """PSI of the NEWEST batch's routed distribution against every
    prior batch's (numeric: n_tok; categorical: source, sink). The
    yardstick side is the accumulated history, so a drifted new epoch
    cannot re-normalize itself. First epoch (nothing to compare
    against) is an explicit skip, not an empty table."""
    from pyspark.sql import functions as F

    from ves_spark.operators.drift import population_stability

    routed = pipe.routed()
    mx = routed.agg(F.max("batch_seq")).first()[0]
    if mx is None:
        return {"drift": "skipped", "reason": "no routed data"}
    ref = routed.filter(F.col("batch_seq") < mx)
    if ref.isEmpty():
        return {"drift": "skipped", "reason": "first epoch, no baseline"}
    cur = routed.filter(F.col("batch_seq") == mx)
    psi = population_stability(
        ref, cur, numeric_cols=["n_tok"], categorical_cols=["source", "sink"]
    )
    rows = [
        (c, float(v), bool(v >= args.drift_threshold))
        for c, v in sorted(psi.items())
    ]
    spark.createDataFrame(
        rows, "feature string, psi double, flagged boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{args.out}/drift")
    return {
        "drift_epoch": int(mx),
        "drift_flagged": sum(1 for r in rows if r[2]),
        "drift_features": len(rows),
    }


def _write_assembly(spark, pipe: Pipeline, args) -> dict:
    """shuffle -> pack -> split over the routed table, written as
    sized outputs to <out>/assembly, hive-partitioned by _split.

    * docs are deduped to one row per doc_id first (routing fans a doc
      to 0..k sinks; training assembly wants each doc once) — the
      per-doc columns are identical across its sink copies, so the
      dedup is deterministic;
    * the split is a hash of doc_id (ppm grid), so a doc can never
      leak across train/val/test regardless of sink fan-out or reruns;
    * within each split, order = deterministic_shuffle (seeded hash,
      range-partitioned — no single-partition sort) and packing =
      pack_chunks_sharded (exact prefix sums via the decomposed scan,
      size-capped shards), or first-fit-decreasing whole-doc bins per
      shard with --assemble-pack ffd;
    * ONE plan covers all three splits: ``_split`` is the packing
      stream column and the write is ``partitionBy("_split")`` — the
      routed corpus is scanned once and shuffled once, not once per
      split (at 100 TB a per-split loop would triple the dominant
      cost). Per-split prefix sums are identical to packing each
      split alone: the stream partition restricts the global shuffle
      order to the split;
    * --target-file-bytes (the run's existing knob) caps assembly
      files too, via the same once-per-leg bytes/row probe.
    """
    from pyspark.sql import functions as F

    from ves_spark.operators.packing import (
        deterministic_shuffle,
        pack_chunks_sharded,
        pack_first_fit_decreasing,
    )

    docs = (
        pipe.routed()
        .select("doc_id", "tokens", "n_tok", "source")
        .dropDuplicates(["doc_id"])
    )
    seed = args.assemble_seed
    ppm = F.pmod(
        F.xxhash64(F.lit(int(seed)), F.lit("split"), F.col("doc_id")),
        F.lit(1_000_000),
    )
    test_ppm = int(args.assemble_test_pct * 10_000)
    val_ppm = int(args.assemble_val_pct * 10_000)
    tagged = docs.withColumn(
        "_split",
        F.when(ppm < test_ppm, "test")
        .when(ppm < test_ppm + val_ppm, "val")
        .otherwise("train"),
    )
    shuf = deterministic_shuffle(tagged, seed, key_col="doc_id")
    packed = pack_chunks_sharded(
        shuf,
        args.assemble_capacity,
        F.col("n_tok"),
        shard_budget=args.assemble_shard_budget,
        part_col="_split",
        order_col="shuffle_order",
    ).drop("n_size")
    if args.assemble_pack == "ffd":
        bins = pack_first_fit_decreasing(
            packed,
            args.assemble_capacity,
            stream_cols=["_split", "shard"],
        ).select("doc_id", "shard", "bin_id")
        packed = packed.drop("shard").join(bins, "doc_id")
    opts = {}
    if args.target_file_bytes > 0:
        from ves_spark.sources.sizing import estimate_row_bytes

        bpr = estimate_row_bytes(packed)
        opts["maxRecordsPerFile"] = max(
            1, int(args.target_file_bytes / max(bpr, 1e-9))
        )
    writer = packed.write.mode("overwrite").partitionBy("_split")
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.parquet(f"{args.out}/assembly")
    stats: dict = {"assembly_capacity": args.assemble_capacity}
    counts = {
        r["_split"]: r["n"]
        for r in spark.read.parquet(f"{args.out}/assembly")
        .groupBy("_split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for name in ("train", "val", "test"):
        stats[f"assembly_{name}_docs"] = int(counts.get(name, 0))
    return stats


def _post_run(spark, pipe: Pipeline, args) -> None:
    if args.alerts:
        print(json.dumps(_write_alerts(pipe, args)))
    if args.drift:
        print(json.dumps(_write_drift(spark, pipe, args)))
    if args.assemble:
        print(json.dumps(_write_assembly(spark, pipe, args)))


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
        help="after each run that processed units, score the finalized "
        "rollup with the trailing-baseline spike/drop detector "
        "(gap-filled) and write the flagged buckets to <out>/alerts",
    )
    p.add_argument(
        "--alert-lookback",
        type=int,
        default=12,
        help="trailing baseline length in buckets for --alerts",
    )
    p.add_argument(
        "--drift",
        action="store_true",
        help="after each run that processed units, PSI-score the newest "
        "batch's routed distribution (n_tok, source, sink) against all "
        "prior batches' and write per-feature psi + flagged to "
        "<out>/drift; skipped on the first epoch",
    )
    p.add_argument(
        "--drift-threshold",
        type=float,
        default=0.25,
        help="PSI at or above this flags the feature (0.25 = the "
        "conventional major-shift threshold; 0.1 = moderate)",
    )
    p.add_argument(
        "--assemble",
        action="store_true",
        help="after each run that processed units, assemble the routed "
        "docs into training data: deterministic shuffle -> sequence "
        "packing -> doc-hash train/val/test split, written to "
        "<out>/assembly partitioned by _split",
    )
    p.add_argument("--assemble-seed", type=int, default=0)
    p.add_argument(
        "--assemble-capacity",
        type=int,
        default=2048,
        help="tokens per training chunk (chunks mode) or per bin (ffd)",
    )
    p.add_argument(
        "--assemble-pack",
        choices=["chunks", "ffd"],
        default="chunks",
        help="chunks = GPT-style concat-and-slice (docs may span a "
        "boundary); ffd = whole-doc first-fit-decreasing bins per shard",
    )
    p.add_argument(
        "--assemble-shard-budget",
        type=int,
        default=1 << 27,
        help="max tokens of start positions per (split, shard) stream — "
        "bounds every per-stream kernel regardless of corpus skew",
    )
    p.add_argument("--assemble-val-pct", type=float, default=1.0)
    p.add_argument("--assemble-test-pct", type=float, default=1.0)
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
    _post_run(spark, pipe, args)
    if args.watch_interval > 0:
        # the reference's rescan loop (discovery.rs:56-87): discover()
        # assigns any newly appeared files to a fresh ingest batch and
        # run() processes exactly that; product legs re-run after any
        # pass that processed units so <out>/alerts|drift|assembly
        # never go stale (ADVICE r5)
        import time as _time

        while True:
            _time.sleep(args.watch_interval)
            stats = pipe.run()
            if stats["units_processed"]:
                print(json.dumps(stats))
                _post_run(spark, pipe, args)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
