"""Physical-plan assertions: the properties that make the pipeline
scale must be visible in the plan, not just hoped for (predicate
pushdown to the parquet scan, column pruning, broadcast enrich, no
shuffle before the rollup exchange)."""

import os

import pytest

from pyspark.sql import functions as F

from ves_spark.enrich import enrich
from ves_spark.parse import parse_builtin
from ves_spark.route import route


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def frames(spark, fixture_dir):
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    meta = spark.read.parquet(os.path.join(fixture_dir, "source_meta.parquet"))
    rules = spark.read.parquet(os.path.join(fixture_dir, "route_rules.parquet"))
    return seq, meta, rules


def test_filter_pushdown_reaches_scan(spark, fixture_dir):
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    plan = _plan(seq.filter(F.col("source") == "src-hot").select("doc_id", "n_tok"))
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,src-hot)]" in plan


def test_column_pruning(spark, fixture_dir):
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    # a query not touching `tokens` must not read it from parquet
    plan = _plan(seq.groupBy("source").agg(F.sum("n_tok")))
    assert "tokens" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_rollup_prunes_tokens_but_parse_requires_them(frames):
    seq, meta, rules = frames
    routed = route(enrich(parse_builtin(seq), meta), rules)
    agg = routed.groupBy("sink", "source", "time_bucket").count()
    read_schema = _plan(agg).split("ReadSchema:")[1].splitlines()[0]
    # parse needs tokens (level/status come from tokens[0], tokens[2])
    assert "tokens" in read_schema
    # but the untouched payload columns stay pruned
    assert "doc_id" not in read_schema


def test_single_exchange_in_pipeline(frames):
    """parse->enrich->route is one narrow stage; the rollup is the
    ONLY exchange (plus the broadcast, which is not a shuffle)."""
    seq, meta, rules = frames
    routed = route(enrich(parse_builtin(seq), meta), rules)
    agg = routed.groupBy("sink", "source", "time_bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    plan = _plan(agg)
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, f"expected exactly 1 shuffle, got {n_shuffles}:\n{plan}"
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_route_keeps_whole_stage_codegen(frames):
    """The compiled rule array must be evaluated inside codegen (a
    Project), not inside the interpreted Generate."""
    seq, meta, rules = frames
    routed = route(enrich(parse_builtin(seq), meta), rules)
    plan = _plan(routed.select("sink"))
    gen_line = next(l for l in plan.splitlines() if "Generate explode" in l)
    # the generator argument is a plain attribute, not the when-chain
    assert "CASE WHEN" not in gen_line


def test_increment_partials_no_single_partition_exchange(spark, fixture_dir, tmp_path):
    """The rollup-partials write path must repartition by unit_id, not
    funnel through one task (round-1 anti-pattern: repartition(1))."""
    from ves_spark.pipeline import Pipeline, PipelineConfig

    conf = PipelineConfig(
        sequences_path=os.path.join(fixture_dir, "sequences.parquet"),
        source_meta_path=os.path.join(fixture_dir, "source_meta.parquet"),
        route_rules_path=os.path.join(fixture_dir, "route_rules.parquet"),
        out_dir=str(tmp_path),
        n_units=8,
        units_per_increment=8,
    )
    p = Pipeline(spark, conf)
    p.run()
    routed_back = p.routed()
    partials = routed_back.groupBy(
        "batch_seq", "unit_id", "sink", "source", "time_bucket"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    plan = _plan(partials.repartition("unit_id"))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(unit_id" in plan


def test_vocab_topk_is_distributed_topk(spark, fixture_dir):
    """vocab_topk must plan as TakeOrderedAndProject (per-partition
    top-k then merge), never a global single-partition sort."""
    from ves_spark.queries import queries

    sf = "/root/testdata/sf0.001"
    df = queries()["vocab_topk_words"](spark, sf)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_topk_rankings_keeps_both_topk_operators(spark):
    """The fold must not cost either physical strategy: the grouped
    leg still plans the rank-filter window (WindowGroupLimit pushdown
    or plain Window + Filter), the global leg still plans
    TakeOrderedAndProject — never a global single-partition sort of
    lineitem."""
    from ves_spark.queries import queries

    df = queries()["topk_rankings"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" in plan


def test_dup_span_coverage_gram_shuffle_is_partial_aggregated(spark):
    """ExactSubstr's only corpus-wide shuffle carries (gram hash,
    partial count) pairs: the gram groupBy must plan a two-phase
    HashAggregate (partial_count map-side before the exchange), and
    gram generation is a higher-order transform inside the scan stage
    (no Python eval operators anywhere in the plan)."""
    from ves_spark.queries import queries

    df = queries()["dup_span_coverage_docs"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ann_ivf_plan_broadcasts_centroids(spark):
    """IVF's scale contract in the plan: corpus-side nearest-centroid
    assignment is a MAP-SIDE argmax over centroid literals (no join,
    no n×k shuffle — `_assign_nearest`), so the only centroid
    cross-join left is the tiny query-side probe ranking; candidate
    generation is a cent_id equi-join (BroadcastHashJoin), never an
    all-pairs corpus×query cross."""
    from ves_spark.queries import queries

    df = queries()["ann_ivf_topk"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # exactly ONE nested-loop remains: query set × broadcast(cents)
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # probe -> inverted-list candidate join is keyed on cent_id
    assert "BroadcastHashJoin [cent_id" in plan
    assert "cent_id" in plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The 100 TB corpus side must NEVER shuffle: the benchmark n-gram
    set is broadcast and the only exchange below the per-doc count is
    the (tiny) benchmark distinct."""
    from ves_spark.operators.text import contaminated_docs

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "), F.col("id")).alias(
            "text"
        ),
    )
    bench = spark.range(0, 3).select(
        F.col("id").alias("bench_id"),
        F.lit("alpha beta gamma delta epsilon").alias("text"),
    )
    plan = _plan(contaminated_docs(docs, bench, n=5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_features_is_map_only(spark):
    """Zero exchanges: the repetition filter rides the scan."""
    from ves_spark.operators.text import repetition_features

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a b c d e f g "), F.col("id")).alias("text"),
    )
    plan = _plan(
        repetition_features(docs, "text", n=3).select(
            "doc_id", "n_ngrams", "n_distinct", "rep_ratio"
        )
    )
    assert "Exchange" not in plan


def test_ngram_builder_not_inlined_per_element(spark):
    """The O(words^2) regression guard: the words split and the gram
    transform must appear as SEPARATE project steps (multiply-
    referenced non-cheap expressions stay un-inlined), so the split
    is not re-evaluated per sequence element inside the lambda. The
    optimized plan must not contain a transform whose lambda body
    embeds the split itself."""
    from ves_spark.operators.text import repetition_features

    docs = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.lit("w x y z w x y z").alias("text"),
    )
    opt = (
        repetition_features(docs, "text", n=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # transform(...)'s lambda must reference the materialized array
    # attribute, not re-split the text: no split() call nested inside
    # a slice() (the lambda body pattern of the regression)
    assert "slice(split(" not in opt.replace(" ", "")


def test_bucketed_join_no_exchange(spark, fixture_dir, tmp_path):
    """north_star 'bucketed writes on doc_id': two tables bucketed on
    the same key with the same bucket count join with ZERO exchanges
    — the shuffle was paid once at write time and every subsequent
    co-located join reuses it."""
    from ves_spark.sources.bucketed import read_bucketed, write_bucketed

    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    left = seq.select("doc_id", "n_tok")
    right = seq.select("doc_id", "source")
    write_bucketed(left, "bk_left", str(tmp_path / "bk_left"), n_buckets=8)
    write_bucketed(right, "bk_right", str(tmp_path / "bk_right"), n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "bk_left").join(
            read_bucketed(spark, "bk_right"), "doc_id"
        )
        plan = _plan(j)
        assert "Exchange" not in plan
        assert j.count() == seq.count()
        # bucket-key aggregation also skips the exchange
        agg = read_bucketed(spark, "bk_left").groupBy("doc_id").count()
        assert "Exchange" not in _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
