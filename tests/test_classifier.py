"""Trained linear quality classifier: exact scalar-reference replay,
cross-engine (DuckDB) training replay, separation on planted classes.

The operator's whole value is REPRODUCIBLE training: the quantized
gradient sums make every iteration an order-independent integer
aggregate, and the rational sigmoid keeps all float work inside
correctly-rounded IEEE ops — so the scalar reference and the DuckDB
unrolled-CTE replay must match Spark bit-for-bit, not approximately.
"""

from __future__ import annotations

import math

import pytest

from ves_spark.operators.classifier import (
    classifier_score_sql,
    classifier_training_cte_sql,
    score_linear,
    train_linear_classifier,
)

FEATS = ["f1", "f2", "f3"]


def ref_train(rows, iters=2, lr=1.0, quant=1 << 20, init=0.0):
    """Textbook scalar replica of train_linear_classifier — identical
    op order: left-fold z, rational sigmoid, floor-quantized integer
    gradient sums, fixed-order weight update."""
    k = len(rows[0][0]) + 1
    w = [float(init)] * k
    for _ in range(iters):
        sums, n = [0] * k, 0
        for x, y in rows:
            z = w[0]
            for wj, fj in zip(w[1:], x):
                z = z + wj * fj
            p = 0.5 + z / (2.0 * (1.0 + abs(z)))
            err = p - float(y)
            for j, fj in enumerate([1.0] + list(x)):
                sums[j] += math.floor(err * fj * float(quant))
            n += 1
        w = [wj - lr * ((sj / quant) / n) for wj, sj in zip(w, sums)]
    return w


def ref_score(x, w):
    z = w[0]
    for wj, fj in zip(w[1:], x):
        z = z + wj * fj
    return round(0.5 + z / (2.0 * (1.0 + abs(z))), 6)


def _toy_rows(n=120):
    """Deterministic, linearly-separable-ish feature rows in [0,1]."""
    rows = []
    for i in range(n):
        y = i % 2
        # class-dependent means with deterministic 'noise'
        f1 = (0.7 if y else 0.25) + ((i * 37) % 11) / 100.0
        f2 = (0.6 if y else 0.30) + ((i * 53) % 13) / 100.0
        f3 = ((i * 29) % 17) / 17.0  # uninformative
        rows.append(([min(f1, 1.0), min(f2, 1.0), f3], y))
    return rows


@pytest.fixture(scope="module")
def toy_df(spark):
    rows = _toy_rows()
    return spark.createDataFrame(
        [(x[0], x[1], x[2], y) for x, y in rows],
        "f1 double, f2 double, f3 double, y int",
    ), rows


def test_train_matches_scalar_reference_exactly(toy_df):
    df, rows = toy_df
    w_spark = train_linear_classifier(df, FEATS, "y", iters=3, lr=1.0)
    w_ref = ref_train(rows, iters=3, lr=1.0)
    assert w_spark == w_ref  # bit-for-bit, not approx


def test_scoring_matches_scalar_reference_exactly(toy_df):
    df, rows = toy_df
    w = ref_train(rows, iters=2)
    got = {
        (r["f1"], r["f2"], r["f3"]): r["clf_prob"]
        for r in score_linear(df, FEATS, w).collect()
    }
    for x, _y in rows:
        assert got[tuple(x)] == ref_score(x, w)


def test_classifier_separates_planted_classes(toy_df):
    df, rows = toy_df
    w = train_linear_classifier(df, FEATS, "y", iters=8, lr=4.0)
    scored = score_linear(df, FEATS, w).collect()
    correct = sum(
        1 for r in scored if (r["clf_prob"] >= 0.5) == (r["y"] == 1)
    )
    assert correct / len(scored) >= 0.9


def test_duckdb_replays_training_and_scoring(toy_df):
    duckdb = pytest.importorskip("duckdb")
    df, rows = toy_df
    w = train_linear_classifier(df, FEATS, "y", iters=2, lr=1.0)
    spark_probs = {
        (r["f1"], r["f2"], r["f3"]): r["clf_prob"]
        for r in score_linear(df, FEATS, w).collect()
    }
    ctes, w_cte = classifier_training_cte_sql(
        "feat", FEATS, "y", iters=2, lr=1.0
    )
    score = classifier_score_sql(w_cte, FEATS, len(FEATS))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE feat(f1 DOUBLE, f2 DOUBLE, f3 DOUBLE, y INT)"
    )
    con.executemany(
        "INSERT INTO feat VALUES (?, ?, ?, ?)",
        [(x[0], x[1], x[2], y) for x, y in rows],
    )
    out = con.execute(
        f"WITH {ctes} SELECT f1, f2, f3, {score} AS p "
        f"FROM feat CROSS JOIN {w_cte}"
    ).fetchall()
    assert len(out) == len(rows)
    for f1, f2, f3, p in out:
        assert spark_probs[(f1, f2, f3)] == p  # exact cross-engine
    # and the unrolled weights themselves equal the driver-loop's
    wcols = con.execute(f"WITH {ctes} SELECT * FROM {w_cte}").fetchone()
    assert list(wcols) == w


def test_guards(toy_df, spark):
    df, _ = toy_df
    with pytest.raises(ValueError):
        train_linear_classifier(df, [], "y")
    with pytest.raises(ValueError):
        train_linear_classifier(df, FEATS, "y", iters=0)
    with pytest.raises(ValueError):
        score_linear(df, FEATS, [0.0, 0.0])  # wrong arity
    empty = df.filter("f1 < -1")
    with pytest.raises(ValueError):
        train_linear_classifier(empty, FEATS, "y")
