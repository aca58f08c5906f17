"""Aggregate stage: per-sink count/sum/percentile rollups.

The reference declares this capability via its ``prometheus`` (counters)
and ``hdrhistogram`` (percentiles) deps with zero call sites
(Cargo.toml:62,68; component Cargo.toml:45,51) — the rebuild makes it
real: hash aggregates keyed by (sink, source, time_bucket).

Scale notes:
* ``count``/``sum`` are algebraic — Spark computes map-side partials
  before the shuffle, so the shuffle carries one row per
  (partition × group), not per input row.
* ``percentile_approx`` is a mergeable KLL-ish sketch — same
  partial/final shape, bounded memory per group at any scale.
* The hot source (src-hot ≈ 40% of rows) makes (source, time_bucket)
  groups skewed. For algebraic aggs the map-side partials already
  neutralize that (each task emits ≤1 row per group). The salted
  two-phase variant below exists for the pathological case — few
  groups, many partitions, sketch merges dominated by one key — and
  as the explicit skew-handling pattern the north_star requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PERCENTILES = [0.5, 0.95, 0.99]
APPROX_ACCURACY = 10_000


def _metric_aggs(exact_percentiles: bool) -> list:
    pctl = F.percentile if exact_percentiles else (
        lambda c, ps: F.percentile_approx(c, ps, APPROX_ACCURACY)
    )
    ps = pctl(F.col("n_tok"), PERCENTILES)
    return [
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
        F.sum(F.col("n_tok").cast("long") * 4).alias("sum_bytes"),
        F.element_at(ps, 1).alias("p50"),
        F.element_at(ps, 2).alias("p95"),
        F.element_at(ps, 3).alias("p99"),
    ]


def rollup(routed: DataFrame, exact_percentiles: bool = False) -> DataFrame:
    """One-shot hash aggregate (partial+final from Catalyst)."""
    return routed.groupBy("sink", "source", "time_bucket").agg(
        *_metric_aggs(exact_percentiles)
    )


def rollup_salted(routed: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregate for skewed keys (algebraic metrics
    only — sketches would need a mergeable-state UDAF, at which point
    AQE + percentile_approx's built-in partial merge is the better
    tool).

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials.
    """
    salted = routed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salt_buckets))
    )
    partial = salted.groupBy("sink", "source", "time_bucket", "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("n_tok").cast("long")).alias("_sum_n_tok"),
        F.sum(F.col("n_tok").cast("long") * 4).alias("_sum_bytes"),
    )
    return partial.groupBy("sink", "source", "time_bucket").agg(
        F.sum("_cnt").alias("cnt"),
        F.sum("_sum_n_tok").alias("sum_n_tok"),
        F.sum("_sum_bytes").alias("sum_bytes"),
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    resolutions: tuple[int, ...] = (300, 3600, 86400),
    labels: tuple[str, ...] = ("5m", "1h", "1d"),
    cents: int = 100,
) -> DataFrame:
    """Multi-resolution continuous aggregate (the hypertable-rollup
    pattern): the FINEST level aggregates the raw stream exactly once;
    every coarser level merges the previous level's partials — counts
    and integer-quantized value sums are exactly mergeable, so the
    hourly numbers derived from 5-minute partials are bit-identical
    to aggregating raw, and the daily level never touches anything
    bigger than the hourly table. Resolutions must nest (each a
    multiple of the previous) so bucket floors compose.

    At 100 TB this is the difference between one corpus scan per
    resolution and one scan total: level i+1's input is the level-i
    aggregate (|groups| rows, metadata-sized next to the corpus). In
    a maintained pipeline the finest rollup is the stored table and
    the coarser levels are derived views over it.

    Values are quantized to ``floor(value * cents)`` longs before
    summing — one correctly-rounded IEEE multiply + exact floor — so
    partial sums are order-independent integers and any engine
    replays them (same trick as the k-means integer mean and the LM
    fluency quantization). Output: one row per (res, keys, bucket)
    with ``bucket_start`` in epoch seconds (timezone-free).
    """
    if len(labels) != len(resolutions):
        raise ValueError(
            f"labels/resolutions length mismatch: {len(labels)} vs "
            f"{len(resolutions)}"
        )
    for a, b in zip(resolutions, resolutions[1:]):
        if b % a != 0:
            raise ValueError(f"resolutions must nest: {b} % {a} != 0")
    scale = F.lit(float(cents))
    base = resolutions[0]
    cur = df.groupBy(
        *key_cols,
        (
            F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(float(base)))
            * F.lit(base)
        )
        .cast("long")
        .alias("bucket_start"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.floor(F.col(value_col).cast("double") * scale).cast("long")
        ).alias("_cents"),
    )
    # Materialize each level: without it Catalyst merges the stacked
    # aggregates and every resolution rescans RAW (3 scans observed);
    # the checkpointed partials make the cascade structural — one
    # corpus scan, coarser levels read the (group-count-sized) level
    # below. localCheckpoint, not persist(): CacheManager holds
    # cached plans until an explicit unpersist (a leak across
    # repeated invocations), while checkpoint blocks are reclaimed by
    # the ContextCleaner once the frame is garbage-collected.
    cur = cur.localCheckpoint(eager=True)

    def finalize(d: DataFrame, label: str) -> DataFrame:
        return d.select(
            F.lit(label).alias("res"),
            *key_cols,
            "bucket_start",
            "cnt",
            F.round(F.col("_cents") / scale, 2).alias("sum_value"),
            F.round(F.col("_cents") / (scale * F.col("cnt")), 4).alias(
                "avg_value"
            ),
        )

    out = finalize(cur, labels[0])
    for res, label in zip(resolutions[1:], labels[1:]):
        cur = cur.groupBy(
            *key_cols,
            (
                F.floor(F.col("bucket_start") / F.lit(float(res)))
                * F.lit(res)
            )
            .cast("long")
            .alias("bucket_start"),
        ).agg(F.sum("cnt").alias("cnt"), F.sum("_cents").alias("_cents"))
        cur = cur.localCheckpoint(eager=True)
        out = out.unionByName(finalize(cur, label))
    return out
