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


# --------------------------------- pipeline cardinality partials (KMV)

import os

from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import write_fixture


@pytest.fixture(scope="module")
def kmv_fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kmv_fix"))
    write_fixture(d, 6_000, seed=99)
    return d


def _pconf(fix, out, run_id):
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        n_units=4,
        units_per_increment=2,  # two increments -> cross-batch merge
        run_id=run_id,
    )


def test_pipeline_kmv_partials_match_direct_sketch(
    spark, kmv_fix, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("kmv_out"))
    pipe = Pipeline(spark, _pconf(kmv_fix, out, "kmv"))
    pipe.run()

    # bit-for-bit: merged per-(unit,sink) partials == one-shot sketch
    # over the full routed table (incremental == single-pass)
    from ves_spark.operators.sketches import kmv_merge_agg, kmv_sketch

    merged = (
        pipe.catalog.read(spark, "kmv_partial")
        .groupBy("sink")
        .agg(kmv_merge_agg("mins", Pipeline.KMV_K).alias("mins"))
    )
    direct = kmv_sketch(
        pipe.routed().select("sink", "doc_id"),
        "doc_id",
        ["sink"],
        k=Pipeline.KMV_K,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # estimates land near the exact per-sink distinct counts
    exact = {
        r["sink"]: r["d"]
        for r in pipe.routed()
        .groupBy("sink")
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    for r in pipe.distinct_docs_per_sink().collect():
        e = exact[r["sink"]]
        if e < Pipeline.KMV_K:
            assert r["est_distinct"] == float(e)
        else:
            assert abs(r["est_distinct"] - e) / e < 0.25


def test_pipeline_kmv_crash_resume_equals_single_shot(
    spark, kmv_fix, tmp_path_factory
):
    single = Pipeline(
        spark, _pconf(kmv_fix, str(tmp_path_factory.mktemp("kmv_s")), "s")
    )
    single.run()

    out = str(tmp_path_factory.mktemp("kmv_c"))
    crash = Pipeline(spark, _pconf(kmv_fix, out, "c"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crash.run(fail_after_units=2)
    resumed = Pipeline(spark, _pconf(kmv_fix, out, "c"))
    resumed.run()

    assert sorted(map(tuple, resumed.distinct_docs_per_sink().collect())) == sorted(
        map(tuple, single.distinct_docs_per_sink().collect())
    )
