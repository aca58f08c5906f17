"""Count-min sketch: conservative estimates, error bound, merge
algebra, weighted build, DuckDB bit-for-bit replay, and the pipeline
cms_partial lifecycle (operators/cms.py)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ves_spark.operators.cms import (
    cms_bucket_sql,
    cms_estimate,
    cms_estimate_sql,
    cms_merge_agg,
    cms_merge_expr,
    cms_sketch,
)

D, W = 4, 64


def _skewed(spark, n=4000, seed=7):
    """Zipf-ish key stream: key k appears ~n/(k+1) times. Keeps
    ``id`` so tests can split the multiset deterministically."""
    return (
        spark.range(n)
        .withColumn(
            "key",
            F.concat(
                F.lit("k"),
                F.floor(
                    F.pow(
                        F.pmod(F.xxhash64("id", F.lit(seed)), 10_000) / 10_000.0,
                        F.lit(3.0),
                    )
                    * 40
                ).cast("int"),
            ),
        )
        .select("id", F.lit("g").alias("grp"), "key")
    )


def test_estimates_are_conservative_within_bound(spark):
    df = _skewed(spark)
    n = df.count()
    sk = cms_sketch(df, "key", ["grp"], depth=D, width=W)
    exact = {r["key"]: r["c"] for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()}
    est_rows = (
        df.select("key")
        .distinct()
        .crossJoin(sk)
        .select("key", cms_estimate("counters", F.col("key"), D, W).alias("est"))
        .collect()
    )
    assert len(est_rows) == len(exact)
    margin = 4 * n / W  # deterministic data: either holds forever or fails now
    for r in est_rows:
        true = exact[r["key"]]
        assert r["est"] >= true, f"{r['key']}: est {r['est']} < true {true}"
        assert r["est"] <= true + margin


def test_merge_of_halves_equals_whole_both_shapes(spark):
    df = _skewed(spark, n=3000)
    whole = cms_sketch(df, "key", ["grp"], depth=D, width=W)
    h1 = cms_sketch(df.where("id % 2 = 0"), "key", ["grp"], depth=D, width=W)
    h2 = cms_sketch(df.where("id % 2 = 1"), "key", ["grp"], depth=D, width=W)
    merged_expr = (
        h1.withColumnRenamed("counters", "a")
        .join(h2.withColumnRenamed("counters", "b"), "grp")
        .select("grp", cms_merge_expr(["a", "b"]).alias("counters"))
    )
    merged_agg = (
        h1.unionAll(h2)
        .groupBy("grp")
        .agg(cms_merge_agg("counters").alias("counters"))
    )
    w = whole.collect()
    assert sorted(map(tuple, merged_expr.collect())) == sorted(map(tuple, w))
    assert sorted(map(tuple, merged_agg.collect())) == sorted(map(tuple, w))


def test_weighted_build_equals_exploded(spark):
    df = _skewed(spark, n=2500)
    pre = df.groupBy("grp", "key").agg(F.count("*").alias("cnt"))
    a = cms_sketch(df, "key", ["grp"], depth=D, width=W)
    b = cms_sketch(pre, "key", ["grp"], depth=D, width=W, weight_col="cnt")
    assert a.collect() == b.collect()


def test_md5_mode_replays_in_duckdb_bit_for_bit(spark):
    pdf = pd.DataFrame(
        {
            "grp": ["g1"] * 60 + ["g2"] * 40,
            "key": [f"tok{i % 13}" for i in range(60)]
            + [f"tok{i % 5}" for i in range(40)],
        }
    )
    sdf = spark.createDataFrame(pdf)
    spark_sk = {
        r["grp"]: list(r["counters"])
        for r in cms_sketch(
            sdf, "key", ["grp"], depth=D, width=W, hash_mode="md5"
        ).collect()
    }

    con = duckdb.connect()
    con.register("occ", pdf)
    per_row = "\nUNION ALL\n".join(
        f"SELECT grp, {r * W} + {cms_bucket_sql('key', r, W)} AS idx FROM occ"
        for r in range(D)
    )
    duck = con.execute(
        f"""
        WITH buck AS ({per_row}),
        counts AS (SELECT grp, idx, count(*) AS c FROM buck GROUP BY 1, 2),
        dense AS (
          SELECT g.grp, i.i AS idx, coalesce(c.c, 0) AS c
          FROM (SELECT DISTINCT grp FROM occ) g
          CROSS JOIN range(0, {D * W}) i(i)
          LEFT JOIN counts c ON c.grp = g.grp AND c.idx = i.i
        )
        SELECT grp, list(c ORDER BY idx) AS counters FROM dense GROUP BY grp
        """
    ).fetchall()
    duck_sk = {g: list(arr) for g, arr in duck}
    assert spark_sk == duck_sk

    # point estimates replay too (same md5 buckets, 1-based lists)
    est_spark = {
        (r["grp"], r["key"]): r["est"]
        for r in sdf.distinct()
        .join(
            cms_sketch(sdf, "key", ["grp"], depth=D, width=W, hash_mode="md5"),
            "grp",
        )
        .select(
            "grp",
            "key",
            cms_estimate("counters", F.col("key"), D, W, "md5").alias("est"),
        )
        .collect()
    }
    con.register(
        "sk",
        pd.DataFrame(
            [(g, arr) for g, arr in duck_sk.items()],
            columns=["grp", "counters"],
        ),
    )
    est_duck = {
        (g, k): e
        for g, k, e in con.execute(
            f"""
            SELECT o.grp, o.key, {cms_estimate_sql('s.counters', 'o.key', D, W)} AS est
            FROM (SELECT DISTINCT grp, key FROM occ) o JOIN sk s ON s.grp = o.grp
            """
        ).fetchall()
    }
    assert est_spark == est_duck


def test_bad_geometry_raises(spark):
    df = _skewed(spark, n=10)
    with pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "key", ["grp"], depth=0, width=W)
    with pytest.raises(ValueError, match="hash_mode"):
        cms_sketch(df, "key", ["grp"], hash_mode="sha9")


# ---------------------------------------------------------------- pipeline

from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import write_fixture


@pytest.fixture(scope="module")
def cms_fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cms_fix"))
    write_fixture(d, 4_000, seed=17)
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


def _gram_expr():
    from ves_spark.operators.token_dedup import _gram_hash_expr

    return F.expr(_gram_hash_expr("tokens", Pipeline.CMS_GRAM_K, "xxhash64"))


def test_pipeline_cms_partials_match_direct_sketch(
    spark, cms_fix, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("cms_out"))
    pipe = Pipeline(spark, _pconf(cms_fix, out, "cms"))
    pipe.run()

    merged = (
        pipe.catalog.read(spark, "cms_partial")
        .groupBy("sink")
        .agg(cms_merge_agg("counters").alias("counters"))
    )
    grams = pipe.routed().select("sink", F.explode(_gram_expr()).alias("gram"))
    direct = cms_sketch(
        grams,
        "gram",
        ["sink"],
        depth=Pipeline.CMS_DEPTH,
        width=Pipeline.CMS_WIDTH,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # query three real trigrams: estimates dominate the exact counts
    # and stay within the CMS bound of them
    docs = pipe.routed().select("tokens").limit(3).collect()
    tris = [list(r["tokens"][:3]) for r in docs]
    tri_hash = {
        i: r["h"]
        for i, r in enumerate(
            spark.createDataFrame(
                [(t,) for t in tris], "tokens array<int>"
            )
            .select(F.xxhash64("tokens").alias("h"))
            .collect()
        )
    }
    exact = {
        (r["sink"], r["gram"]): r["c"]
        for r in grams.groupBy("sink", "gram").agg(F.count("*").alias("c")).collect()
    }
    totals = {
        r["sink"]: r["n"]
        for r in grams.groupBy("sink").agg(F.count("*").alias("n")).collect()
    }
    got = pipe.trigram_freq_per_sink(tris).collect()
    assert {r["sink"] for r in got} == set(totals)
    for r in got:
        true = exact.get((r["sink"], tri_hash[r["tri_id"]]), 0)
        assert r["est_count"] >= true
        assert r["est_count"] <= true + 4 * totals[r["sink"]] / Pipeline.CMS_WIDTH


def test_pipeline_cms_crash_resume_equals_single_shot(
    spark, cms_fix, tmp_path_factory
):
    single = Pipeline(
        spark, _pconf(cms_fix, str(tmp_path_factory.mktemp("cms_s")), "s")
    )
    single.run()
    tris = [[1, 2, 3], [7, 7, 7]]

    out = str(tmp_path_factory.mktemp("cms_c"))
    crash = Pipeline(spark, _pconf(cms_fix, out, "c"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crash.run(fail_after_units=2)
    resumed = Pipeline(spark, _pconf(cms_fix, out, "c"))
    resumed.run()

    assert sorted(
        map(tuple, resumed.trigram_freq_per_sink(tris).collect())
    ) == sorted(map(tuple, single.trigram_freq_per_sink(tris).collect()))


def test_trigram_query_length_validated(spark, cms_fix, tmp_path_factory):
    pipe = Pipeline(
        spark, _pconf(cms_fix, str(tmp_path_factory.mktemp("cms_v")), "v")
    )
    with pytest.raises(ValueError, match="exactly"):
        pipe.trigram_freq_per_sink([[1, 2]])
