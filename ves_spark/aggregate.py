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
