"""Count-min sketch: a MERGEABLE linear-sketch frequency summary for
UNBOUNDED key spaces (token n-grams, fingerprints), the third member
of the pipeline's partial-sketch family next to the order-statistic
KMV (distinct counts) and the HDR histogram (percentiles).

Why count-min and not exact counts: per-(sink, token) counts are
bounded by the vocabulary and stay exact-countable at any scale, but
per-(sink, trigram) counts are vocab³-bounded — at a 10^5 vocab the
key space is 10^15, so an exact groupBy materializes a state table
proportional to the corpus' distinct-gram count. The CMS is a FIXED
depth×width counter matrix per group:

* the partial is a plain ``array<bigint>`` of length depth*width —
  storable next to rollup/hdr/kmv partials, inspectable with SQL;
* merging is element-wise addition (``zip_with(a, b, +)``) —
  associative AND commutative, the same contract as every other
  partial, so incremental batches fold in any order and crash/resume
  is trivially equal to single-shot;
* estimates are one-sided: ``est >= true`` ALWAYS (counters only ever
  add), and ``est <= true + 2N/width`` per row with prob ≥ 1/2, so
  min over ``depth`` independent rows is within ``2N/width`` with
  prob ≥ 1 - 2^-depth (Cormode & Muthukrishnan 2005);
* with the injectable md5-based row hash, DuckDB replays the whole
  counter matrix AND the point estimates bit-for-bit — integer
  arithmetic end to end, no float anywhere.

100 TB shape: gram hashing is map-side (``transform(sequence(...))``
inside the scan stage, see operators/token_dedup.py); the ONLY
shuffle is the (group, row, bucket) partial count — after map-side
combine each map task emits ≤ depth*width rows per group, so shuffle
volume is (groups × depth × width) longs regardless of corpus size.
The counter assembly then runs over that metadata-sized aggregate.

Reference basis: per-source frequency telemetry generalizes the
reference's per-source row/byte counters
(`src/tailer/manager.rs:21-29`); sketch-style mergeable rollups per
the `hdrhistogram` intent (`/root/reference/Cargo.toml:68`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ves_spark.operators.sketches import md5_hash60, md5_hash60_sql

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(key: Column, row: int, width: int, hash_mode: str) -> Column:
    """Bucket id of ``key`` under hash row ``row``: row-salted hash
    mod width. ``xxhash64`` is the production mode (seeded by a
    leading literal column); ``md5`` is the cross-engine mode DuckDB
    replays digit-for-digit (:func:`cms_bucket_sql`)."""
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(row), key), F.lit(width))
    if hash_mode == "md5":
        salted = F.concat_ws(":", F.lit(str(row)), key.cast("string"))
        return F.pmod(md5_hash60(salted), F.lit(width))
    raise ValueError(f"hash_mode must be 'xxhash64' or 'md5', got {hash_mode!r}")


def cms_bucket_sql(key_sql: str, row: int, width: int) -> str:
    """DuckDB twin of :func:`cms_bucket` in md5 mode (pmod == % here
    because the md5 hash is non-negative by construction)."""
    salted = f"concat('{row}', ':', CAST({key_sql} AS VARCHAR))"
    return f"({md5_hash60_sql(salted)} % {width})"


def cms_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_mode: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group CMS: ``group_cols + [counters: array<bigint>]`` with
    ``counters[r*width + b] = Σ weight over keys hashing to (r, b)``.
    One input row is one key occurrence (weight 1) unless
    ``weight_col`` names a pre-aggregated count."""
    if depth < 1 or width < 2:
        raise ValueError("cms_sketch needs depth >= 1 and width >= 2")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    key = F.col(key_col)
    # flat counter index per hash row, exploded ×depth BEFORE the
    # partial agg — map-side combine collapses to ≤ depth*width rows
    # per group per map task, so the ×depth never reaches the shuffle
    idx = F.explode(
        F.array(
            *[
                (F.lit(r * width) + cms_bucket(key, r, width, hash_mode)).cast(
                    "int"
                )
                for r in range(depth)
            ]
        )
    )
    counts = (
        df.select(*group_cols, idx.alias("_i"), w.alias("_w"))
        .groupBy(*group_cols, "_i")
        .agg(F.sum("_w").alias("_c"))
    )
    # assemble the dense array from the sparse (idx, count) rows:
    # ≤ depth*width entries per group — metadata-sized buffers
    return (
        counts.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_i"), F.col("_c")))
            ).alias("_m")
        )
        .select(
            *group_cols,
            F.expr(
                f"transform(sequence(0, {depth * width - 1}), "
                f"i -> coalesce(try_element_at(_m, i), CAST(0 AS BIGINT)))"
            ).alias("counters"),
        )
    )


def cms_merge_expr(counter_cols: list[Column | str]) -> Column:
    """Merge sketches column-wise: element-wise sum — associative and
    commutative, so incremental partials fold in any order."""
    cols = [F.col(c) if isinstance(c, str) else c for c in counter_cols]
    merged = cols[0]
    for c in cols[1:]:
        merged = F.zip_with(merged, c, lambda a, b: a + b)
    return merged


def cms_merge_agg(counters_col: str) -> Column:
    """Aggregation-shaped merge: fold MANY sketch rows per group into
    one. The buffer holds n_rows_in_group × depth*width longs, so at
    very long batch histories merge in two levels (per (group, batch)
    first, then per group) — both levels are this same expression."""
    return F.aggregate(
        F.collect_list(counters_col),
        F.expr("CAST(NULL AS ARRAY<BIGINT>)"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.zip_with(acc, x, lambda a, b: a + b)
        ),
    )


def cms_estimate(
    counters: Column | str,
    key: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_mode: str = "xxhash64",
) -> Column:
    """Point estimate for ``key``: min over the depth rows' counters.
    One-sided — never below the true count. A key the group never saw
    can still read > 0 (collision), but never reads null: every
    bucket exists in the dense array."""
    c = F.col(counters) if isinstance(counters, str) else counters
    reads = [
        F.get(c, (F.lit(r * width) + cms_bucket(key, r, width, hash_mode)).cast("int"))
        for r in range(depth)
    ]
    return reads[0] if depth == 1 else F.least(*reads)


def cms_estimate_sql(
    counters_sql: str,
    key_sql: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of :func:`cms_estimate` in md5 mode (1-based list
    indexing there)."""
    reads = [
        f"{counters_sql}[{r * width} + {cms_bucket_sql(key_sql, r, width)} + 1]"
        for r in range(depth)
    ]
    return reads[0] if depth == 1 else "least(" + ", ".join(reads) + ")"
