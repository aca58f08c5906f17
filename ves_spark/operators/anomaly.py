"""Rate-spike detection over time-bucketed rollups: the alerting half
of the observability loop the reference instruments but never closes
(`prometheus` metrics intent, `/root/reference/Cargo.toml:62` — the
agent EXPORTS per-source rates; deciding a rate is anomalous is left
to the operator reading the dashboards).

Method: per series (the group columns), each bucket's value is scored
against the TRAILING TIME WINDOW of the previous ``lookback`` bucket
widths — z-score when the baseline has variance, a ratio fallback when
the baseline is flat (a constant series has std 0; any z-score there
is undefined, and "value jumped to 3× a flat baseline" is exactly the
alert a flat-line service wants). The current bucket is excluded from
its own baseline — including it both dilutes the mean and inflates
the std, muting precisely the spikes being hunted.

The window is RANGE-based on the bucket time, not row-based: rollups
only hold buckets that had events, so "the previous N rows" silently
spans idle gaps — a service resuming after a day's outage would be
z-scored against week-old rows as if adjacent. With the range frame,
buckets missing from the trailing time span simply shrink ``base_n``,
and the ``min_baseline`` guard leaves post-gap buckets unflagged until
a fresh baseline accrues instead of scoring them against stale data.
(The dual blind spot — a rate DROP to zero emits no row to score — is
closed by :func:`fill_bucket_gaps`: densify each series with explicit
zero buckets from its first bucket to the GLOBAL max bucket (the
"now" horizon a stopped series cannot extend itself), then score;
``detect_rate_spikes(..., fill_gaps=True)`` does both and also emits
the symmetric ``is_drop`` flag. The grid is series × horizon buckets
— still metadata-scale next to the corpus, but materialize it only
for alerting passes, not as a stored table.)

Spark shape: one shuffle on the series key, then pure window
aggregates over ``rangeBetween(-lookback*bucket_width, -1)`` — whole-
stage codegen, no UDF, and the identical window SQL runs on any engine
(the tests oracle it against DuckDB verbatim). At 100 TB the input is
a ROLLUP (buckets × series, metadata-scale next to the corpus), not
raw events — detection rides the already-aggregated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _time_key(df: DataFrame, time_col: str):
    """``(key_expr, restore_fn)`` for ``time_col``: a numeric seconds
    key plus the inverse mapping a long column name back to the
    ORIGINAL dtype. Dtype-string dispatch, not isinstance: parquet
    scans yield TIMESTAMP_NTZ, a distinct type ANSI mode refuses to
    cast straight to BIGINT.

    Each type converts timezone-free in BOTH directions, so a DST
    transition in the session timezone can neither warp the bucket
    spacing nor relabel buckets on the way back:

    * TIMESTAMP (instant): ``unix_timestamp`` / ``timestamp_seconds``
      — pure epoch arithmetic, no wall-clock strings;
    * TIMESTAMP_NTZ / DATE (wall time): ``timestampdiff`` /
      ``timestampadd`` against an NTZ epoch literal — pure wall-time
      arithmetic, the session timezone never participates;
    * numeric: plain cast."""
    dt = dict(df.dtypes)[time_col]
    c = f"`{time_col}`"
    if dt == "timestamp":
        key = F.unix_timestamp(F.col(time_col)).cast("long")
        restore = lambda k: F.timestamp_seconds(F.col(k))  # noqa: E731
    elif dt.startswith("timestamp") or dt == "date":  # NTZ / DATE
        key = F.expr(
            f"timestampdiff(SECOND, {_NTZ_EPOCH}, CAST({c} AS TIMESTAMP_NTZ))"
        ).cast("long")
        restore = lambda k: F.expr(  # noqa: E731
            f"timestampadd(SECOND, `{k}`, {_NTZ_EPOCH})"
        )
    else:
        key = F.col(time_col).cast("long")
        restore = lambda k: F.col(k)  # noqa: E731

    def restore_typed(k: str):
        return restore(k).cast(dt).alias(time_col)

    return key, restore_typed


def fill_bucket_gaps(
    rollup: DataFrame,
    group_cols: list[str],
    time_col: str = "time_bucket",
    value_col: str = "cnt",
    bucket_width: int = 1,
    max_buckets_per_series: int = 2_000_000,
) -> DataFrame:
    """Densify an event-only rollup: emit an explicit ``value = 0``
    row for every bucket a series was silent, from the series' FIRST
    bucket through the GLOBAL max bucket. The global horizon is the
    point: a series that stopped emits nothing and can never extend
    its own max — only the rest of the fleet's clock exposes its
    silence. Non-``value_col`` columns are dropped (a synthesized zero
    bucket has no values for them).

    Scale: one metadata-sized per-series min aggregate, one global
    single-row max broadcast, one ``sequence``-explode whose output is
    series × horizon buckets — rollup-scale, never event-scale. The
    per-series grid is bounded: ``sequence`` builds ONE in-memory
    array per series before exploding, so an unwindowed multi-year
    rollup at a fine width would silently OOM an executor —
    ``max_buckets_per_series`` makes that case fail LOUDLY (the
    ``assert_true`` is folded into the grid column so pruning cannot
    drop it), telling the caller to pre-filter the rollup's time range
    or coarsen the width, the right alerting shape anyway."""
    t_key, restore = _time_key(rollup, time_col)
    keyed = rollup.withColumn("_t_key", t_key)
    lo = keyed.groupBy(*group_cols).agg(F.min("_t_key").alias("_lo"))
    hi = keyed.agg(F.max("_t_key").alias("_hi"))
    w = F.lit(int(bucket_width))
    guard = F.assert_true(
        (F.col("_hi") - F.col("_lo")) / w
        < F.lit(int(max_buckets_per_series)),
        F.concat(
            F.lit(
                "fill_bucket_gaps: a series would densify to more than "
                f"{max_buckets_per_series} buckets — pre-filter the "
                "rollup's time range or use a coarser bucket_width"
            ),
        ),
    )
    grid = (
        lo.join(F.broadcast(hi))
        .select(
            *group_cols,
            F.explode(
                F.when(
                    guard.isNull(), F.sequence("_lo", "_hi", w)
                )
            ).alias("_t_key"),
        )
    )
    # full outer: a real bucket not aligned to the series' lo + k*width
    # grid (shouldn't happen for window()-produced rollups, but cheap
    # to be safe) survives instead of being silently dropped
    filled = grid.join(
        keyed.select(*group_cols, "_t_key", value_col),
        [*group_cols, "_t_key"],
        "full",
    ).withColumn(value_col, F.coalesce(F.col(value_col), F.lit(0)))
    # reconstruct the ORIGINAL dtype (timestamp vs timestamp_ntz vs
    # date vs numeric) so filled output unions cleanly with the input
    return filled.select(*group_cols, restore("_t_key"), value_col)


def detect_rate_spikes(
    rollup: DataFrame,
    group_cols: list[str],
    time_col: str = "time_bucket",
    value_col: str = "cnt",
    lookback: int = 12,
    bucket_width: int = 1,
    z_thresh: float = 4.0,
    flat_ratio: float = 3.0,
    min_baseline: int = 3,
    fill_gaps: bool = False,
) -> DataFrame:
    """Per-series trailing-time-window spike flags.

    ``bucket_width`` is the spacing between adjacent buckets in
    ``time_col``'s units — seconds when ``time_col`` is a timestamp
    (e.g. 300 for a 5-minute rollup), plain units when it is numeric.
    The baseline for a bucket at time t is every bucket in the CLOSED
    interval ``[t - lookback*bucket_width, t - 1]`` (rangeBetween is
    inclusive at both frame ends) — at most ``lookback + 1`` grid
    positions but ``lookback`` actual buckets on a width-aligned
    rollup, fewer when the series was idle.

    Adds ``base_n``, ``base_mean``, ``base_std`` (population, over the
    trailing span), ``z`` (null when the baseline is flat or too
    short), and ``is_spike``: z >= ``z_thresh``, or value >=
    ``flat_ratio`` × a flat positive baseline. Buckets with fewer than
    ``min_baseline`` in-span predecessors are never flagged — one
    prior point is not a baseline, and neither is last week's.

    ``fill_gaps=True`` first densifies via :func:`fill_bucket_gaps`
    (dropping non-value columns) and adds the symmetric ``is_drop``
    flag: z <= -``z_thresh``, or value <= baseline/``flat_ratio``
    against a flat positive baseline — the "service went silent"
    alert an event-only rollup structurally cannot raise."""
    if lookback < min_baseline:
        raise ValueError(
            f"lookback ({lookback}) must be >= min_baseline ({min_baseline})"
        )
    if bucket_width <= 0:
        raise ValueError(f"bucket_width ({bucket_width}) must be positive")
    if fill_gaps:
        rollup = fill_bucket_gaps(
            rollup, group_cols, time_col, value_col, bucket_width
        )
    # rangeBetween needs a single numeric ordering key
    t_key, _ = _time_key(rollup, time_col)
    out = rollup.withColumn("_t_key", t_key)
    w = (
        W.partitionBy(*group_cols)
        .orderBy("_t_key")
        .rangeBetween(-lookback * bucket_width, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(value_col).over(w)
    mean = F.avg(v).over(w)
    # population std of the baseline window (var_pop: deterministic,
    # matches DuckDB's var_pop exactly in the oracle replay)
    std = F.sqrt(F.var_pop(v).over(w))
    out = (
        out.withColumn("base_n", n)
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
    if fill_gaps:
        out = out.withColumn(
            "is_drop",
            F.when(F.col("base_n") < min_baseline, F.lit(False)).otherwise(
                F.coalesce(F.col("z") <= -z_thresh, F.lit(False))
                | (
                    (F.col("base_std") == 0)
                    & (F.col("base_mean") > 0)
                    & (v <= F.col("base_mean") / flat_ratio)
                )
            ),
        )
    return out.drop("_t_key")
