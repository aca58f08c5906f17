"""HDR-histogram percentiles for streams (and any pre-aggregated
rollup).

The reference declares ``hdrhistogram`` (Cargo.toml:68) precisely for
percentiles over a stream. The Spark-first translation is NOT a custom
UDAF: an HDR histogram is just a count per log-spaced bucket, and a
count per bucket is a plain streaming ``groupBy(window, keys,
bucket).count()`` — built-in, watermarked, incrementally merged by the
state store, shuffle carries only (key, bucket, count). Percentile
extraction is a cheap batch bucket-walk over the emitted histogram.

Bucketing (classic HDR indexing, ``precision_bits = p``):
* values < 2^p map to themselves (exact region);
* above, every octave [2^e, 2^(e+1)) splits into 2^p sub-buckets —
  relative quantile error <= 2^-p, memory O(p · log(max_value)).

Everything is integer math in JVM expressions (floor(log2) via binary
string length — no float edge cases at powers of two), so results are
deterministic across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

DEFAULT_PRECISION_BITS = 7  # <=0.8% quantile error, exact below 256


def hdr_bucket(col: Column, p: int = DEFAULT_PRECISION_BITS) -> Column:
    """HDR bucket index of a non-negative integer value (exact for
    v < 2^(p+1), log-spaced with 2^p sub-buckets per octave above)."""
    v = col.cast("long")
    # floor(log2(v)) for v >= 1, integer-exact: bit_length - 1
    e = (F.length(F.conv(v, 10, 2)) - 1).cast("int")
    # call_function: the SQL shiftright accepts a column shift count
    # (the Python F.shiftright wrapper is literal-only)
    sub = F.call_function("shiftright", v, e - p)
    idx = (e - p + 1) * (1 << p) + sub - (1 << p)
    return (
        F.when(v <= 0, F.lit(0))
        .when(v < (1 << p), v)
        .otherwise(idx)
        .cast("int")
    )


def hdr_bucket_lower(idx: Column, p: int = DEFAULT_PRECISION_BITS) -> Column:
    """Smallest value mapping to a bucket (the bucket's representative;
    equals the value exactly in the exact region)."""
    k = F.shiftright(idx, p)  # = e - p + 1 in the log region
    r = idx.bitwiseAND(F.lit((1 << p) - 1))
    lower = F.call_function("shiftleft", (r + (1 << p)).cast("long"), k - 1)
    return F.when(idx < (1 << (p + 1)), idx.cast("long")).otherwise(lower)


def rollup_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "n_tok",
    p: int = DEFAULT_PRECISION_BITS,
) -> DataFrame:
    """(group_cols..., bucket, cnt, sum_v) — the mergeable sketch rows.
    Works identically on a batch frame or a watermarked streaming
    frame (it is a plain groupBy aggregation)."""
    return df.groupBy(
        *group_cols, hdr_bucket(F.col(value_col), p).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("long")).alias("sum_v"),
    )


def percentiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    probs: dict[str, float] | None = None,
    p: int = DEFAULT_PRECISION_BITS,
) -> DataFrame:
    """Nearest-rank percentiles from histogram rows: per group, the
    smallest bucket whose cumulative count reaches ceil(q·total);
    reported as the bucket's lower bound (relative error <= 2^-p).
    Also re-emits exact cnt / sum_v totals."""
    probs = probs or {"p50": 0.5, "p95": 0.95, "p99": 0.99}
    wcum = W.partitionBy(*group_cols).orderBy("bucket")
    wall = W.partitionBy(*group_cols)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("total", F.sum("cnt").over(wall))
    )
    val = hdr_bucket_lower(F.col("bucket"), p)
    aggs = [
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")), val)
        ).alias(name)
        for name, q in probs.items()
    ]
    return cum.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"), F.sum("sum_v").alias("sum_v"), *aggs
    )
