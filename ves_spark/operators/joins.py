"""Join algorithms Spark lacks natively, expressed as compositions of
built-in operators.

Range (interval) join: pair every point with every interval containing
it. Spark's own planner turns the naive formulation
``points.join(intervals, (p >= s) & (p < e))`` into a
BroadcastNestedLoopJoin (small side) or a CartesianProduct — O(n*m)
comparisons, a non-starter at corpus scale. The bucketized form below
is the standard scale path (the same trick Databricks' range-join
optimization applies): quantize the domain into fixed-width buckets,
replicate each interval into every bucket it overlaps, map each point
to its single bucket, hash-equi-join on the bucket id, then refine
with the exact predicate. Cost is O(n + m * ceil(len/width)) join
input rows and one shuffle per side — and each surviving (point,
interval) pair meets on exactly one bucket (the point's), so no
dedup pass is needed.

Reference basis: the reference's router/dispatch stage is pure
equi-routing (`/root/reference/components/core-agent/src/tailer/
tailer_events.rs:26-54`); range predicates appear in the rebuild's
brief as the "range join" custom-operator ask next to the as-of join
(`ves_spark/queries.py::asof_join_last_order`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "_rj_bkt"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` where
    ``start <= point < end`` (half-open), as a bucketized hash
    equi-join. All three bound columns must be numeric in a shared
    unit (epoch days, epoch micros, plain longs — caller's choice);
    pick ``bucket_width`` near the typical interval length so most
    intervals replicate into ~2 buckets.

    100 TB shape: both sides shuffle once on the 8-byte bucket id
    (AQE handles skewed buckets); interval replication is bounded by
    ``ceil(interval_len / bucket_width) + 1`` copies; the exact
    predicate runs post-join as a codegen'd filter. No nested-loop or
    cartesian operator ever appears in the plan.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(float(bucket_width))
    pt = points.withColumn(
        _BKT, F.floor(F.col(point_col) / w).cast("long")
    )
    # Replicate each interval into every bucket it can touch. The end
    # bound is exclusive, but a point in end's bucket may still fall
    # below end, so floor(end / w) is included; empty intervals
    # (end <= start) produce a descending sequence bound -> guard to
    # emit no buckets at all. A single outlier interval much longer
    # than bucket_width would replicate into millions of copies (or
    # overflow F.sequence outright), so replication is capped: the
    # job fails LOUDLY with the offending width, telling the caller
    # to pick a coarser bucket_width — never silently explodes the
    # shuffle. assert_true is folded into the bucket column itself so
    # column pruning cannot drop the check.
    lo = F.floor(F.col(start_col) / w).cast("long")
    hi = F.floor(F.col(end_col) / w).cast("long")
    guard = F.assert_true(
        hi - lo < F.lit(int(max_buckets_per_interval)),
        F.concat(
            F.lit(
                "bucketed_range_join: interval spans more than "
                f"{max_buckets_per_interval} buckets (start="
            ),
            F.col(start_col).cast("string"),
            F.lit(", end="),
            F.col(end_col).cast("string"),
            F.lit(
                f", bucket_width={float(bucket_width)!r}) — use a wider "
                "bucket_width or raise max_buckets_per_interval"
            ),
        ),
    )
    iv = intervals.withColumn(
        _BKT,
        F.explode(
            F.when(
                guard.isNull()
                & (F.col(end_col) > F.col(start_col)),
                F.sequence(lo, hi),
            ).otherwise(F.lit(None).cast("array<long>"))
        ),
    )
    return (
        pt.join(iv, _BKT)
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop(_BKT)
    )
