"""Structured Streaming wrapper over the batch pipeline.

The reference's 'streaming' is incremental file reads with resumable
checkpoints (SURVEY.md §2.3) — the batch pipeline + lineage store
already covers that semantic. This wrapper is the live-tail variant:
the same stateless parse → enrich → route stages applied to a
``readStream`` source, with a watermarked tumbling-window rollup
replacing the batch groupBy (late data handled by the watermark
instead of snapshot boundaries).

The stage functions are shared verbatim with the batch path — they
are stateless column transforms, so Structured Streaming accepts them
unchanged; only the source and the aggregation differ. Per-sink
delivery uses ``foreachBatch`` in production (exactly-once via the
sink's idempotent write + the streaming checkpoint); tests use the
memory sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ves_spark.enrich import enrich
from ves_spark.parse import parse
from ves_spark.route import route
from ves_spark.schema import SEQUENCES


def dedup_stream(
    df: DataFrame,
    key: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-by-identity on the live stream: a redelivered row
    with an already-seen ``key`` is dropped while the key is inside
    the watermark window — the reference's core dedup semantic
    (discovery.rs:33-35 skips files whose identity the checkpoint
    already holds), which the batch path enforces via the lineage
    anti-join but the stream path previously did not. State is keyed
    by ``key`` in the state store (one shuffle) and evicted once the
    event-time watermark passes the row's timestamp + delay, so state
    is bounded by the redelivery horizon, not the stream length.

    ``key="content"`` dedups by token-array identity instead of
    doc_id — the streaming counterpart of the batch pipeline's
    ``dedup_content`` (pipeline.py::_dedup_content), using the SAME
    two-xxhash64 128-bit identity so batch and stream agree on what
    "the same document" means. State then holds two longs per distinct
    content inside the watermark window, never the token arrays."""
    if key == "content":
        hashed = df.withColumn("_h1", F.xxhash64("tokens")).withColumn(
            "_h2", F.xxhash64(F.lit("ves-content-dedup"), "tokens")
        )
        out = hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["_h1", "_h2"]
        )
        return out.drop("_h1", "_h2")
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def stream_transform(
    spark: SparkSession,
    stream_df: DataFrame,
    source_meta_path: str,
    route_rules_path: str,
    parse_impl: str = "builtin",
    dedup: bool | str = False,
) -> DataFrame:
    """parse -> [dedup] -> enrich -> route on a streaming frame.

    ``dedup=True`` inserts exactly-once-by-doc_id between parse and
    enrich (before route, which fans rows out 0..k-fold and would make
    the identity non-unique); ``dedup="content"`` dedups by
    token-array identity instead (the streaming counterpart of the
    batch ``dedup_content``). The stateless stages are shared verbatim
    with the batch path."""
    meta = spark.read.parquet(source_meta_path)
    rules = spark.read.parquet(route_rules_path)
    parsed = parse(stream_df, parse_impl)
    if dedup:
        parsed = dedup_stream(
            parsed, key="content" if dedup == "content" else "doc_id"
        )
    return route(enrich(parsed, meta), rules)


def stream_rollup(routed: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window rollup per (sink, source).

    count/sum only — these merge incrementally in the state store.
    For percentiles over the stream use ``stream_rollup_hdr`` +
    ``finalize_stream_percentiles`` (mergeable HDR histogram).
    """
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("win"), "sink", "source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
        )
        .select(
            F.col("win.start").alias("time_bucket"),
            "sink",
            "source",
            "cnt",
            "sum_n_tok",
        )
    )


def stream_rollup_hdr(
    routed: DataFrame, watermark: str = "10 minutes", p: int = 7
) -> DataFrame:
    """Percentile-capable streaming rollup: a mergeable HDR histogram
    per (window, sink, source) — just a watermarked groupBy with the
    bucket as an extra key, so the state store merges it incrementally
    and the shuffle carries only (key, bucket, count). Percentiles are
    extracted downstream by ``finalize_stream_percentiles`` (the
    reference's hdrhistogram intent, Cargo.toml:68)."""
    from ves_spark.streaming.hdr import rollup_histogram

    keyed = routed.withWatermark("ts", watermark).withColumn(
        "win", F.window("ts", "5 minutes")
    )
    hist = rollup_histogram(keyed, ["win", "sink", "source"], "n_tok", p)
    return hist.select(
        F.col("win.start").alias("time_bucket"), "sink", "source", "bucket",
        "cnt", "sum_v",
    )


def finalize_stream_percentiles(hist: DataFrame, p: int = 7) -> DataFrame:
    """Batch bucket-walk over streamed histogram rows → per-group
    (cnt, sum_v exact; p50/p95/p99 within 2^-p relative error)."""
    from ves_spark.streaming.hdr import percentiles_from_histogram

    return percentiles_from_histogram(
        hist, ["time_bucket", "sink", "source"], p=p
    )


def deliver_to_sinks(
    catalog, table_prefix: str = "sink_", routed_state_path: str | None = None
):
    """foreachBatch writer: per-sink fan-out through the TableCatalog
    seam (the reference's event dispatcher, one write per sink).

    Exactly-once: Structured Streaming's checkpoint gives at-least-once
    foreachBatch invocations with a stable ``batch_id``; writing each
    micro-batch as an overwrite of its own ``_batch_id`` partition
    makes redelivery idempotent — the canonical replayable-sink
    pattern. The batch is persisted once and sliced per sink (the sink
    set is bounded by the route rules, so the driver-side distinct is
    metadata-sized).

    ``routed_state_path``: file persisting the set of sink tables THIS
    query has ever routed to, used to scope the stale-sink retraction
    below. Without it the set lives only in this closure — fine for a
    single process, but retraction after a restart then can't see
    sinks written solely by a pre-crash attempt, so production callers
    (``run_per_sink_delivery``) keep it next to the streaming
    checkpoint. Scoping matters: retracting from every catalog table
    matching ``table_prefix`` would let two queries sharing a catalog
    root (whose independent batch_id counters both start at 0) delete
    each other's committed partitions every batch."""
    import json  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    mem_routed: set[str] = set()

    def _ever_routed(current: set[str]) -> set[str]:
        """Union ``current`` into the persisted ever-routed set and
        return it. Persisted BEFORE the partition writes so any table
        a crashed attempt may have written is already recorded when
        the retry reads the set back."""
        ever = set(mem_routed)
        if routed_state_path and os.path.exists(routed_state_path):
            try:
                with open(routed_state_path) as f:
                    ever |= set(json.load(f))
            except (OSError, ValueError):
                pass
        ever |= current
        if routed_state_path:
            tmp = f"{routed_state_path}.tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(ever), f)
            os.replace(tmp, routed_state_path)
        mem_routed.clear()
        mem_routed.update(ever)
        return ever

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        stamped = batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
        stamped.persist()
        try:
            sinks = [r["sink"] for r in stamped.select("sink").distinct().collect()]
            present = {f"{table_prefix}{s}" for s in sinks}
            ever = _ever_routed(present)
            for s in sinks:
                catalog.overwrite_partitions(
                    stamped.filter(F.col("sink") == s).drop("sink"),
                    f"{table_prefix}{s}",
                    ["_batch_id"],
                )
            # Redelivery retraction for sinks NOT in this attempt: if a
            # crashed earlier attempt of THIS batch_id wrote sink X's
            # partition and the retry no longer routes to X (route
            # rules changed across restart), that stale partition would
            # be double-counted forever — overwrite can't touch a sink
            # it never writes. Scope: only tables THIS query has ever
            # routed to (never other queries' tables under a shared
            # catalog root). Idempotent and metadata-cheap.
            for tbl in sorted(ever - present):
                catalog.delete_partitions(tbl, [{"_batch_id": int(batch_id)}])
        finally:
            stamped.unpersist()

    return deliver


def run_per_sink_delivery(
    spark: SparkSession,
    sequences_dir: str,
    source_meta_path: str,
    route_rules_path: str,
    catalog,
    checkpoint_dir: str,
    dedup: bool | str = False,
) -> None:
    """Drive the routed stream to completion, delivering per-sink
    tables via foreachBatch (production shape; tests run it on a
    finite directory). ``dedup=True`` turns on exactly-once-by-doc_id
    across micro-batches (``dedup_stream``); ``dedup="content"``
    dedups by token-array identity — opt-in because inputs that
    legitimately re-use ids (append-style fixtures) would be
    collapsed."""
    stream = open_stream(spark, sequences_dir)
    routed = stream_transform(
        spark, stream, source_meta_path, route_rules_path, dedup=dedup
    )
    os.makedirs(checkpoint_dir, exist_ok=True)
    deliver = deliver_to_sinks(
        catalog,
        routed_state_path=os.path.join(checkpoint_dir, "ves_routed_sinks.json"),
    )
    q = (
        routed.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def open_stream(spark: SparkSession, sequences_dir: str) -> DataFrame:
    """readStream over a parquet directory of token sequences."""
    return (
        spark.readStream.schema(SEQUENCES)
        .option("maxFilesPerTrigger", 4)
        .parquet(sequences_dir)
    )


def run_to_memory(
    spark: SparkSession,
    sequences_dir: str,
    source_meta_path: str,
    route_rules_path: str,
    query_name: str = "ves_stream",
    output_mode: str = "complete",
):
    """Drive the stream to completion synchronously (test/dev helper).

    complete mode so a finite input emits its final aggregates —
    append mode would hold the last windows in state waiting for a
    watermark bump that never comes.
    """
    stream = open_stream(spark, sequences_dir)
    routed = stream_transform(spark, stream, source_meta_path, route_rules_path)
    agg = stream_rollup(routed)
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
