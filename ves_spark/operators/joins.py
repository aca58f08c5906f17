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
    # emit no buckets at all.
    iv = intervals.withColumn(
        _BKT,
        F.explode(
            F.when(
                F.col(end_col) > F.col(start_col),
                F.sequence(
                    F.floor(F.col(start_col) / w).cast("long"),
                    F.floor(F.col(end_col) / w).cast("long"),
                ),
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
