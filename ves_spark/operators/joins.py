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


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_expr=None,
) -> DataFrame:
    """Skew-busting equi-join for the middle regime the built-ins miss:
    ``small`` is too large to broadcast, ``big``'s join keys are
    heavy-hitter skewed, and a plain shuffle join would send every row
    of a hot key to ONE reducer task. The classic salted-repartition
    form (the north-star's "salted keys for skewed sources"): the big
    side gets a deterministic per-row salt in ``[0, n_salts)``, the
    small side is replicated once per salt, and the equi-join runs on
    ``keys + salt`` — a hot key's rows spread across ``n_salts``
    tasks, each meeting its own full copy of that key's small rows.

    Result is row-for-row the plain ``big.join(small, on, how)`` for
    the big-side-preserving joins (``inner``/``left``): every big row
    carries exactly ONE salt and meets the complete replica of its
    key there — multiplicities and null-padding are untouched.
    ``right``/``full`` would see each unmatched small row once PER
    REPLICA and are refused.

    Cost model (why this is not the default): the small side's shuffle
    volume is multiplied by ``n_salts``. Worth it iff
    ``n_salts * |small| << |big's hot keys|`` — i.e. exactly when one
    reducer would otherwise run for hours. For small sides under the
    broadcast threshold use ``F.broadcast`` (no shuffle at all); for
    mild skew AQE's runtime skew-split
    (``spark.sql.adaptive.skewJoin``) is free and needs no replication
    — this operator is for the skew you can predict and must kill at
    plan time (a 10^11-row hot source against a 10^8-row dim).

    ``salt_expr`` defaults to ``xxhash64(struct(*big.columns))`` —
    deterministic and reshard-stable. Fully identical duplicate rows
    share a salt (they carry no distinguishing bits to hash); callers
    with such data pass e.g. ``salt_expr=F.xxhash64("doc_id")`` on a
    unique column, or any expression of their choosing — salt values
    never affect the result, only the spread (a NULL-evaluating
    expression is coalesced to salt 0, so nullable salt columns cannot
    silently drop rows from the join).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_skew_join supports how='inner'|'left', got {how!r} — "
            "right/full would duplicate unmatched small rows per replica"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if salt_expr is None:
        salt_expr = F.xxhash64(F.struct(*[F.col(c) for c in big.columns]))
    b = big.withColumn(
        "_salt",
        F.coalesce(F.pmod(salt_expr, F.lit(n_salts)), F.lit(0)).cast("int"),
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")
