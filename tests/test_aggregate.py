import os

import pytest

from tests.conftest import assert_same_rows
from ves_spark import refimpl
from ves_spark.aggregate import rollup, rollup_salted
from ves_spark.enrich import enrich
from ves_spark.parse import parse_builtin
from ves_spark.route import route

EXACT = ["sink", "source", "time_bucket", "cnt", "sum_n_tok", "sum_bytes"]


@pytest.fixture(scope="module")
def routed_df(spark, fixture_dir):
    seq = spark.read.parquet(os.path.join(fixture_dir, "sequences.parquet"))
    meta = spark.read.parquet(os.path.join(fixture_dir, "source_meta.parquet"))
    rules = spark.read.parquet(os.path.join(fixture_dir, "route_rules.parquet"))
    return route(enrich(parse_builtin(seq), meta), rules)


@pytest.fixture(scope="module")
def ref_rollup_pdf(seq_pdf, meta_pdf, rules_pdf):
    return refimpl.ref_rollup(
        refimpl.ref_route(refimpl.ref_enrich(refimpl.ref_parse(seq_pdf), meta_pdf), rules_pdf)
    )


def test_rollup_counts_exact(routed_df, ref_rollup_pdf):
    got = rollup(routed_df).toPandas()
    assert_same_rows(got[EXACT], ref_rollup_pdf[EXACT])


def test_rollup_salted_equals_plain(routed_df):
    a = rollup_salted(routed_df, salt_buckets=8).toPandas()
    b = rollup(routed_df).toPandas()[["sink", "source", "time_bucket", "cnt", "sum_n_tok", "sum_bytes"]]
    assert_same_rows(a, b)


def test_rollup_percentiles_close(routed_df, ref_rollup_pdf):
    """percentile_approx at accuracy 10k vs exact refimpl percentile:
    groups here are small enough that the sketch is exact."""
    got = rollup(routed_df).toPandas().set_index(["sink", "source", "time_bucket"])
    exp = ref_rollup_pdf.set_index(["sink", "source", "time_bucket"])
    for key in ("p50", "p95", "p99"):
        diff = (got[key].sort_index() - exp[key].sort_index()).abs()
        assert diff.max() <= 1, f"{key}: max diff {diff.max()}"
