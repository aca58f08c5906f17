"""PSI drift detection (operators/drift.py): scores replay a scalar
numpy/pandas reference exactly, identical snapshots score ~0, planted
shifts score past the conventional thresholds, and the yardstick
(bins + kept categories) comes from the reference side only."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ves_spark.operators.drift import (
    OTHER,
    _psi,
    population_stability,
)


def _ref_psi(p_counts: dict, q_counts: dict, eps=1e-6) -> float:
    """Independent scalar reference over raw counts."""
    pt, qt = sum(p_counts.values()), sum(q_counts.values())
    out = 0.0
    for k in set(p_counts) | set(q_counts):
        pi = max(p_counts.get(k, 0) / pt, eps)
        qi = max(q_counts.get(k, 0) / qt, eps)
        out += (pi - qi) * math.log(pi / qi)
    return out


def test_psi_fold_matches_scalar_reference():
    p = {"a": 0.7, "b": 0.2, "c": 0.1}
    q = {"a": 0.5, "b": 0.3, "d": 0.2}
    got = _psi(p, q, 1e-6)
    want = sum(
        (max(p.get(k, 0), 1e-6) - max(q.get(k, 0), 1e-6))
        * math.log(max(p.get(k, 0), 1e-6) / max(q.get(k, 0), 1e-6))
        for k in set(p) | set(q)
    )
    assert got == pytest.approx(want, rel=1e-12)
    assert got > 0


def test_identical_snapshots_score_zero(spark):
    df = spark.createDataFrame(
        [(i, float(i % 50), f"s{i % 5}") for i in range(2000)],
        "id long, x double, src string",
    )
    psi = population_stability(
        df, df, numeric_cols=["x"], categorical_cols=["src"]
    )
    assert psi["x"] == pytest.approx(0.0, abs=1e-9)
    assert psi["src"] == pytest.approx(0.0, abs=1e-9)


def test_planted_numeric_shift_flagged(spark):
    ref = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(5000)], "id long, x double"
    )
    # current: same domain but mass pushed to the top decile
    cur = spark.createDataFrame(
        [(i, float(90 + i % 10) if i % 2 else float(i % 100)) for i in range(5000)],
        "id long, x double",
    )
    psi = population_stability(ref, cur, numeric_cols=["x"])
    assert psi["x"] > 0.25  # "major shift" threshold
    # a mild wiggle stays under the moderate threshold
    mild = spark.createDataFrame(
        [(i, float((i + 3) % 100)) for i in range(5000)], "id long, x double"
    )
    assert population_stability(ref, mild, numeric_cols=["x"])["x"] < 0.1


def test_categorical_shift_matches_count_replay(spark):
    ref_counts = {"web": 600, "wiki": 300, "code": 100}
    cur_counts = {"web": 300, "wiki": 300, "code": 400}
    mk = lambda cnts: spark.createDataFrame(  # noqa: E731
        [(s,) for s, n in cnts.items() for _ in range(n)], "src string"
    )
    psi = population_stability(
        mk(ref_counts), mk(cur_counts), categorical_cols=["src"]
    )
    assert psi["src"] == pytest.approx(_ref_psi(ref_counts, cur_counts), rel=1e-9)


def test_new_category_is_finite_and_large(spark):
    """A source present only in the new epoch lands in __other__ (the
    reference defines the kept set) with eps-smoothed reference mass —
    large but finite."""
    ref = spark.createDataFrame([("web",)] * 900 + [("wiki",)] * 100, "src string")
    cur = spark.createDataFrame(
        [("web",)] * 500 + [("wiki",)] * 100 + [("spamcrawl",)] * 400, "src string"
    )
    psi = population_stability(ref, cur, categorical_cols=["src"])
    want = _ref_psi(
        {"web": 900, "wiki": 100},
        {"web": 500, "wiki": 100, OTHER: 400},
    )
    assert psi["src"] == pytest.approx(want, rel=1e-9)
    assert psi["src"] > 0.25 and math.isfinite(psi["src"])


def test_real_tables_cross_sf_smoke(spark):
    """Drive on the real documents tables: sf0.001 vs sf0.01 are drawn
    from the same generator, so drift must be tiny."""
    a = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    psi = population_stability(
        a, b, numeric_cols=["n_chars"], categorical_cols=["lang", "source"]
    )
    assert all(v < 0.1 for v in psi.values()), psi


def test_requires_columns(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="at least one column"):
        population_stability(df, df)


def test_embedding_norm_drift(spark):
    """Drift reaches the embedding modality through derived numeric
    marginals: PSI over L2 norms is ~0 for same-generator snapshots
    and fires when the current epoch's vectors are rescaled (the
    classic symptom of a changed encoder checkpoint)."""
    from ves_spark.operators.similarity import l2_norm

    a = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select(l2_norm(F.col("embedding")).alias("norm"))
    )
    same = population_stability(a, a, numeric_cols=["norm"])["norm"]
    assert same == pytest.approx(0.0, abs=1e-9)

    rescaled = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select(
            (l2_norm(F.col("embedding")) * F.when(F.xxhash64("vec_id") % 2 == 0, 1.5)
             .otherwise(1.0)).alias("norm")
        )
    )
    shifted = population_stability(a, rescaled, numeric_cols=["norm"])["norm"]
    assert shifted > 0.25
