"""KMV distinct sketch: merge algebra, estimator branches, error
bound, duplicate-insensitivity (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ves_spark.operators.sketches import (
    kmv_estimate_cols,
    kmv_merge_expr,
    kmv_sketch,
    md5_hash60,
)

K = 64


def _ids(spark, lo, hi, group="g"):
    return spark.range(lo, hi).select(
        F.lit(group).alias("grp"), F.col("id").cast("string").alias("key")
    )


def test_sketch_of_whole_equals_merge_of_halves(spark):
    whole = kmv_sketch(_ids(spark, 0, 3000), "key", ["grp"], k=K)
    h1 = kmv_sketch(_ids(spark, 0, 1700), "key", ["grp"], k=K)
    h2 = kmv_sketch(_ids(spark, 1400, 3000), "key", ["grp"], k=K)  # overlap
    merged = (
        h1.withColumnRenamed("mins", "a")
        .join(h2.withColumnRenamed("mins", "b"), "grp")
        .select("grp", kmv_merge_expr(["a", "b"], K).alias("mins"))
    )
    assert whole.collect() == merged.collect()


def test_duplicates_do_not_change_the_sketch(spark):
    base = _ids(spark, 0, 500)
    doubled = base.unionAll(base).unionAll(base)
    assert (
        kmv_sketch(base, "key", ["grp"], k=K).collect()
        == kmv_sketch(doubled, "key", ["grp"], k=K).collect()
    )


def test_exact_branch_below_k(spark):
    sk = kmv_sketch(_ids(spark, 0, 10), "key", ["grp"], k=K)
    row = sk.select("grp", *kmv_estimate_cols(K)).collect()[0]
    assert row["kth"] is None
    assert row["est_distinct"] == 10.0


def test_estimator_error_bound(spark):
    n = 20_000
    sk = kmv_sketch(_ids(spark, 0, n), "key", ["grp"], k=256)
    est = sk.select(*kmv_estimate_cols(256)).collect()[0]["est_distinct"]
    # KMV relative stderr ~ 1/sqrt(k-2) ≈ 6.3%; 15% ≈ 2.4σ
    assert abs(est - n) / n < 0.15


def test_md5_hash_path_matches_default_semantics(spark):
    # the injectable cross-engine hash changes VALUES, not structure:
    # same group keys, same array sizes, same exact-branch behavior
    df = _ids(spark, 0, 40)
    sk = kmv_sketch(df, "key", ["grp"], k=K, hash_col=md5_hash60(F.col("key")))
    row = sk.collect()[0]
    assert len(row["mins"]) == 40
    assert row["mins"] == sorted(row["mins"])


def test_k_below_two_rejected(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_ids(spark, 0, 5), "key", ["grp"], k=1)
