"""KMV (k-minimum-values) distinct-count sketch: mergeable bottom-k
hash partials + the classic (k-1)/u_k estimator.

Why KMV and not HyperLogLog here: Spark's ``approx_count_distinct``
partials are engine-private HLL buffers — they cannot be stored as a
readable partial table, merged across batches by plain column ops, or
replayed by another engine. A KMV sketch is just "the k smallest
distinct 64-bit hashes of the key", so

* the partial is a plain ``array<bigint>`` column — storable next to
  the pipeline's other mergeable partials (rollup_partial,
  hdr_partial) and inspectable with SQL;
* merging is closed-form column algebra: union the arrays, dedup,
  sort, keep the first k (`kmv_merge_expr`) — associative and
  commutative, so incremental batches fold in any order;
* the estimator is one division, and with an injectable cross-engine
  hash (md5-based, like the sampler's) DuckDB replays sketch AND
  estimate bit-for-bit — the property no HLL implementation offers.

Estimator: hashes are uniform on [0, H); if u_k is the k-th smallest
normalized hash, E[distinct] ≈ (k-1)/u_k (Bar-Yossef et al. 2002).
When a group holds fewer than k distinct keys the sketch contains all
of them and the count is EXACT — the estimator must branch, not
extrapolate.

100 TB shape: one shuffle on (group, hash) for the global distinct —
hash-partitioned, so hot groups spread across reducers instead of
serializing; then a window bottom-k per (group, salt) where salt =
hash % n_salts (a pure function of the hash, so per-salt distinctness
is global distinctness) keeps every sort partition at ~D/n_salts
rows; the final per-group merge sees only n_salts arrays of ≤k longs
— metadata-sized. No collect_set of unbounded distinct sets ever
builds up in an aggregation buffer.

Reference basis: per-source cardinality is the natural companion
metric to the reference's per-source row/byte counters
(`src/tailer/manager.rs:21-29`); sketch-style rollups per the
`hdrhistogram` intent (`/root/reference/Cargo.toml:68`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ves_spark.operators.crossengine import duck_md5_int_sql, spark_md5_int

# hashes live in [0, 2^60): 15 hex chars of md5 — large enough that
# collisions are negligible at any test scale, small enough that the
# DuckDB replay's per-character strpos arithmetic stays in BIGINT
KMV_HASH_BITS = 60
KMV_HASH_SPAN = float(1 << KMV_HASH_BITS)  # 2^60, exact as a double


def md5_hash60(col: Column) -> Column:
    """Cross-engine 60-bit hash: first 15 hex chars of md5(key) as a
    long (the shared ``crossengine`` builder — same construction as
    the sampler's md5_32 but wider, so the bottom-k order matches
    DuckDB's digit-by-digit replay exactly)."""
    return spark_md5_int(col, 15)


def md5_hash60_sql(col_sql: str) -> str:
    """DuckDB replay of :func:`md5_hash60`."""
    return duck_md5_int_sql(col_sql, 15)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 256,
    hash_col: Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Per-group KMV sketch: ``group_cols + [mins: array<bigint>]``
    where ``mins`` holds the ≤k smallest distinct hashes of
    ``key_col``. ``hash_col`` defaults to ``xxhash64`` (production);
    pass :func:`md5_hash60` output for cross-engine replay."""
    if k < 2:
        raise ValueError("k must be >= 2 for the (k-1)/u_k estimator")
    h = (
        F.xxhash64(F.col(key_col)).bitwiseAND(F.lit((1 << 60) - 1))
        if hash_col is None
        else hash_col
    )
    hashed = df.select(*group_cols, h.alias("_h"))
    # global distinct on (group, hash): the ONE corpus-sized shuffle,
    # spread by the hash value itself (no per-group hot reducer)
    distinct = hashed.dropDuplicates([*group_cols, "_h"])
    # bottom-k per (group, salt): salt is a pure function of the hash,
    # so per-salt bottom-k loses nothing the merged bottom-k needs;
    # window sorts spill, buffers never hold a whole group
    salted = distinct.withColumn("_salt", F.pmod(F.col("_h"), F.lit(n_salts)))
    w = Window.partitionBy(*group_cols, "_salt").orderBy("_h")
    pruned = (
        salted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    # final fold: n_salts * k longs per group, metadata-sized
    return pruned.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_list("_h")), 1, k).alias("mins")
    )


def kmv_merge_expr(mins_cols: list[Column | str], k: int) -> Column:
    """Merge sketches column-wise: union, dedup, sort, first k —
    associative/commutative, so incremental partials fold in any
    order (the same contract as the HDR partial merge)."""
    arrays = [F.col(c) if isinstance(c, str) else c for c in mins_cols]
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.array(*arrays)))), 1, k
    )


def kmv_merge_agg(mins_col: str, k: int) -> Column:
    """Aggregation-shaped merge: fold MANY sketch rows per group into
    one (``collect_list`` → flatten → dedup → sort → first k). The
    buffer holds n_rows_in_group × k longs, so at very long batch
    histories merge in two levels (per (group, batch) first, then per
    group) — both levels are this same expression, merge order is
    irrelevant by associativity."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(mins_col)))),
        1,
        k,
    )


def kmv_estimate_cols(k: int, mins_col: str = "mins") -> list[Column]:
    """``kth`` (the k-th smallest hash, null if the group is exact)
    and ``est_distinct``: exact size(mins) when < k distinct, else
    round((k-1) * 2^60 / kth) — one double division, replayable."""
    size = F.size(F.col(mins_col))
    # try_: ANSI element_at throws when the group is exact (size < k)
    kth = F.try_element_at(F.col(mins_col), F.lit(k))
    est = F.when(size < k, size.cast("double")).otherwise(
        F.round(
            (F.lit(float(k - 1)) * F.lit(KMV_HASH_SPAN))
            / kth.cast("double"),
            4,
        )
    )
    return [
        F.when(size >= k, kth).alias("kth"),
        est.alias("est_distinct"),
    ]


def kmv_estimate_sql(k: int, mins_sql: str = "mins") -> tuple[str, str]:
    """DuckDB twins of :func:`kmv_estimate_cols` — identical arithmetic
    in identical order, so the driver's value hash matches."""
    size = f"len({mins_sql})"
    kth = f"{mins_sql}[{k}]"
    est = (
        f"CASE WHEN {size} < {k} THEN CAST({size} AS DOUBLE) "
        f"ELSE round((CAST({float(k - 1)!r} AS DOUBLE) * CAST({KMV_HASH_SPAN!r} AS DOUBLE)) "
        f"/ CAST({kth} AS DOUBLE), 4) END"
    )
    return (
        f"CASE WHEN {size} >= {k} THEN {kth} ELSE NULL END AS kth",
        f"{est} AS est_distinct",
    )
