"""Stage-level correctness: Spark stages vs the pandas refimpl, and the
builtin vs Arrow parse kernels against each other."""

import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import assert_same_rows
from ves_spark import refimpl
from ves_spark.enrich import enrich
from ves_spark.parse import parse_arrow, parse_builtin
from ves_spark.route import route, sink_names

PARSE_COLS = ["doc_id", "level_id", "level", "ts_minute", "ts", "time_bucket", "status_code", "status_class"]


@pytest.fixture(scope="module")
def seq_df(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))


@pytest.fixture(scope="module")
def meta_df(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "source_meta.parquet"))


@pytest.fixture(scope="module")
def rules_df(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "route_rules.parquet"))


def test_parse_builtin_vs_refimpl(seq_df, seq_pdf):
    got = parse_builtin(seq_df).select(*PARSE_COLS).toPandas()
    exp = refimpl.ref_parse(seq_pdf)[PARSE_COLS]
    assert_same_rows(got, exp)


def test_parse_arrow_equals_builtin(seq_df):
    a = parse_arrow(seq_df).select(*PARSE_COLS).toPandas()
    b = parse_builtin(seq_df).select(*PARSE_COLS).toPandas()
    assert_same_rows(a, b)


def test_parse_preserves_tokens(seq_df, seq_pdf):
    """Token-array equality invariant (BASELINE.json): the payload
    survives parse byte-for-byte."""
    got = parse_builtin(seq_df).select("doc_id", "tokens", "n_tok").toPandas()
    assert_same_rows(got, seq_pdf[["doc_id", "tokens", "n_tok"]])


def test_enrich_defaults_and_coverage(seq_df, meta_df, seq_pdf, meta_pdf):
    got = (
        enrich(parse_builtin(seq_df), meta_df)
        .select("doc_id", "source", "tenant", "env", "priority")
        .toPandas()
    )
    exp = refimpl.ref_enrich(refimpl.ref_parse(seq_pdf), meta_pdf)[
        ["doc_id", "source", "tenant", "env", "priority"]
    ]
    assert_same_rows(got, exp)
    # src-14 is absent from the dim -> default tenant
    uncovered = got[got["source"] == "src-14"]
    assert len(uncovered) > 0
    assert (uncovered["tenant"] == "unknown_tenant").all()


def test_enrich_is_broadcast(seq_df, meta_df):
    plan = enrich(parse_builtin(seq_df), meta_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_route_sets_match_refimpl(seq_df, meta_df, rules_df, seq_pdf, meta_pdf, rules_pdf):
    routed = route(enrich(parse_builtin(seq_df), meta_df), rules_df)
    got = routed.select("doc_id", "sink", "tokens", "n_tok", "source", "tenant").toPandas()
    exp = refimpl.ref_route(
        refimpl.ref_enrich(refimpl.ref_parse(seq_pdf), meta_pdf), rules_pdf
    )[["doc_id", "sink", "tokens", "n_tok", "source", "tenant"]]
    # per-sink routed-row sets, order-insensitive, with token equality
    assert_same_rows(got, exp)


def test_route_exhaustive_and_no_dup(seq_df, meta_df, rules_df):
    routed = route(enrich(parse_builtin(seq_df), meta_df), rules_df)
    n_in = seq_df.count()
    # every input row lands in >=1 sink
    assert routed.select("doc_id").distinct().count() == n_in
    # no row lands in the same sink twice
    assert routed.groupBy("doc_id", "sink").count().filter(F.col("count") > 1).count() == 0
    # a fan-out case exists (some row in >1 sink)
    assert routed.groupBy("doc_id").count().filter(F.col("count") > 1).count() > 0
    assert set(r["sink"] for r in routed.select("sink").distinct().collect()) <= set(
        sink_names(rules_df)
    )
