"""Rate-spike detection over time-bucketed rollups: the alerting half
of the observability loop the reference instruments but never closes
(`prometheus` metrics intent, `/root/reference/Cargo.toml:62` — the
agent EXPORTS per-source rates; deciding a rate is anomalous is left
to the operator reading the dashboards).

Method: per series (the group columns), each bucket's value is scored
against the TRAILING window of the previous ``lookback`` buckets —
z-score when the baseline has variance, a ratio fallback when the
baseline is flat (a constant series has std 0; any z-score there is
undefined, and "value jumped to 3× a flat baseline" is exactly the
alert a flat-line service wants). The current bucket is excluded from
its own baseline — including it both dilutes the mean and inflates
the std, muting precisely the spikes being hunted.

Spark shape: one shuffle on the series key, then pure window
aggregates over ``rowsBetween(-lookback, -1)`` — whole-stage codegen,
no UDF, and the identical window SQL runs on any engine (the tests
oracle it against DuckDB verbatim). At 100 TB the input is a ROLLUP
(buckets × series, metadata-scale next to the corpus), not raw
events — detection rides the already-aggregated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def detect_rate_spikes(
    rollup: DataFrame,
    group_cols: list[str],
    time_col: str = "time_bucket",
    value_col: str = "cnt",
    lookback: int = 12,
    z_thresh: float = 4.0,
    flat_ratio: float = 3.0,
    min_baseline: int = 3,
) -> DataFrame:
    """Per-series trailing-baseline spike flags.

    Adds ``base_mean``, ``base_std`` (population, over the previous
    ``lookback`` buckets), ``z`` (null when the baseline is flat or
    too short), and ``is_spike``: z >= ``z_thresh``, or value >=
    ``flat_ratio`` × a flat positive baseline. Buckets with fewer
    than ``min_baseline`` predecessors are never flagged — one prior
    point is not a baseline."""
    if lookback < min_baseline:
        raise ValueError(
            f"lookback ({lookback}) must be >= min_baseline ({min_baseline})"
        )
    w = (
        W.partitionBy(*group_cols)
        .orderBy(time_col)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(value_col).over(w)
    mean = F.avg(v).over(w)
    # population std of the baseline window (var_pop: deterministic,
    # matches DuckDB's var_pop exactly in the oracle replay)
    std = F.sqrt(F.var_pop(v).over(w))
    out = (
        rollup.withColumn("base_n", n)
        .withColumn("base_mean", mean)
        .withColumn("base_std", std)
        .withColumn(
            "z",
            F.when(
                (F.col("base_n") >= min_baseline) & (F.col("base_std") > 0),
                (v - F.col("base_mean")) / F.col("base_std"),
            ),
        )
        .withColumn(
            "is_spike",
            F.when(F.col("base_n") < min_baseline, F.lit(False)).otherwise(
                F.coalesce(F.col("z") >= z_thresh, F.lit(False))
                | (
                    (F.col("base_std") == 0)
                    & (F.col("base_mean") > 0)
                    & (v >= F.col("base_mean") * flat_ratio)
                )
            ),
        )
    )
    return out
