"""Distributed trained linear quality classifier (model-based filter).

The model-based member of the quality-filter family, next to the
heuristic ``quality_features`` and the self-trained ``lm_fluency``
bigram LM: a logistic-style linear classifier trained ON the corpus
with full-batch gradient descent, then applied as a map-only scoring
projection. The canonical use is a fastText/CCNet-style "does this
document look like the reference class" cut (here: predict a known
attribute from surface features, threshold on the probability).

Reference basis: the normalization/scoring stage the reference
declares but never implements (`components/core-agent/src/tailer/
manager.rs:28-29`); model-based quality filtering per the task
brief's training-data-pipeline inventory.

Cross-engine EXACT training — the same discipline as the k-means
integer means (`similarity.py::train_kmeans_centroids`) and the LM
fluency quantization (`text.py::lm_fluency`):

* The activation is the RATIONAL sigmoid ``s(z) = 0.5 + z/(2(1+|z|))``
  — add/mul/div/abs only, each a correctly-rounded IEEE-754 op, so any
  engine reproduces it bit-for-bit. ``exp()``'s last ulp varies across
  libm builds; the textbook logistic is the one thing here that could
  NOT be replayed exactly, so it is substituted wholesale. s(z) has
  the same shape, range (0,1), midpoint s(0)=1/2 and monotonicity.
* Per-row gradient contributions ``(s(z) - y) * x_j`` are scaled by an
  exact power of two and floored to longs, so the per-feature gradient
  SUM is an order-independent integer — no float-accumulation order,
  the cross-engine (and re-shard) killer, anywhere.
* The weight update is a fixed left-to-right double expression on the
  driver; ``z`` is the literal-weight left fold ``w0 + w1*f1 + ...``
  in both engines.

100 TB shape: each iteration is ONE corpus scan ending in a global
aggregate of k+1 longs + a count — partial-aggregated map-side, so
only (k+2) * n_partitions values ever shuffle and k+2 reach the
driver. Scoring is a map-only projection that rides the scan stage.
Features are bounded in [0, 1] by construction, so a quantized
contribution is at most ``quant`` in magnitude: at quant = 2^20 the
long sum saturates at ~2^43 rows per cluster — raise-guarded, and at
larger corpora train on a deterministic hash sample (the gradient is
a mean; a 2^40-row sample estimates it beyond float precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ves_spark.operators.crossengine import dlit as _dlit


def fast_sigmoid_sql(z_sql: str) -> str:
    """Rational sigmoid s(z) = 0.5 + z / (2 * (1 + |z|)) as SQL text.

    Every op is one correctly-rounded IEEE-754 double op, so the
    expression is bit-identical in any engine (unlike 1/(1+exp(-z)),
    whose exp() differs in the last ulp across libm builds)."""
    return (
        f"(CAST(0.5 AS DOUBLE) + ({z_sql}) / "
        f"(CAST(2.0 AS DOUBLE) * (CAST(1.0 AS DOUBLE) + abs({z_sql}))))"
    )


def _z_sql(weights: list[float], feature_sql: list[str]) -> str:
    """Literal-weight decision value: ``w0 + w1*f1 + ... + wk*fk``.

    SQL '+' is left-associative in both engines, so the written order
    IS the evaluation order — the fold reproduces bit-for-bit."""
    terms = [_dlit(weights[0])] + [
        f"{_dlit(w)} * ({f})" for w, f in zip(weights[1:], feature_sql)
    ]
    return "(" + " + ".join(terms) + ")"


def _grad_select_sql(
    weights: list[float],
    feature_sql: list[str],
    label_sql: str,
    quant: int,
) -> list[str]:
    """Aggregate expressions for one GD iteration: row count ``n`` and
    per-feature quantized gradient sums ``s0..sk`` (s0 = bias).

    g_j = (s(z) - y) * x_j, floored to a long at scale ``quant`` —
    order-independent integer sums, exactly mergeable map-side."""
    p = fast_sigmoid_sql(_z_sql(weights, feature_sql))
    err = f"({p} - CAST(({label_sql}) AS DOUBLE))"
    feats = ["CAST(1.0 AS DOUBLE)"] + [f"({f})" for f in feature_sql]
    return ["COUNT(1) AS n"] + [
        f"SUM(CAST(floor({err} * {f} * {_dlit(float(quant))}) AS BIGINT))"
        f" AS s{j}"
        for j, f in enumerate(feats)
    ]


def _step(
    weights: list[float], sums: list[int], n: int, lr: float, quant: int
) -> list[float]:
    """One driver-side weight update — a fixed sequence of double ops
    (div, div, mul, sub) replayed identically by the oracle SQL."""
    return [
        wj - lr * ((sj / quant) / n) for wj, sj in zip(weights, sums)
    ]


def train_linear_classifier(
    df: DataFrame,
    feature_sql: list[str],
    label_sql: str,
    iters: int = 2,
    lr: float = 1.0,
    quant: int = 1 << 20,
    init: float = 0.0,
) -> list[float]:
    """Train ``[w_bias, w_1, .., w_k]`` by full-batch GD over
    ``df``. ``feature_sql`` are SQL expressions over df's columns,
    each bounded in [0, 1]; ``label_sql`` evaluates to 0/1.

    Per iteration: one scan, one global aggregate of k+2 values (see
    module docstring for the scale argument). Returns plain floats —
    metadata-sized — so scoring broadcasts literals and an oracle can
    replay the whole training from the same construction."""
    if iters < 1 or not feature_sql:
        raise ValueError("need >=1 iteration and >=1 feature")
    w = [float(init)] * (len(feature_sql) + 1)
    for _ in range(iters):
        row = df.selectExpr(
            *_grad_select_sql(w, feature_sql, label_sql, quant)
        ).collect()[0]
        n = row["n"]
        if not n:
            raise ValueError("cannot train on an empty DataFrame")
        sums = [row[f"s{j}"] for j in range(len(w))]
        w = _step(w, sums, n, lr, quant)
    return w


def score_linear(
    df: DataFrame,
    feature_sql: list[str],
    weights: list[float],
    out_col: str = "clf_prob",
    decimals: int = 6,
) -> DataFrame:
    """Map-only scoring projection: ``s(w · [1, x])`` rounded to
    ``decimals`` — rides the scan stage, zero shuffle at any scale."""
    if len(weights) != len(feature_sql) + 1:
        raise ValueError("weights must be [bias] + one per feature")
    p = fast_sigmoid_sql(_z_sql(weights, feature_sql))
    return df.withColumn(out_col, F.round(F.expr(p), decimals))


def classifier_training_cte_sql(
    feat_cte: str,
    feature_cols: list[str],
    label_col: str,
    iters: int = 2,
    lr: float = 1.0,
    quant: int = 1 << 20,
    init: float = 0.0,
) -> tuple[str, str]:
    """Generate oracle SQL replaying the ENTIRE training: chained CTEs
    ``_g0, _w1, _g1, _w2, ...`` over a caller-provided feature CTE
    named ``feat_cte`` (columns ``feature_cols`` + ``label_col``).

    Iteration i's gradient CTE cross-joins the single-row weight CTE
    from iteration i-1 (iteration 0 uses the init literals), exactly
    the driver-side loop unrolled into SQL — the same unrolling trick
    as `_kmeans_prefix_sql`. Returns ``(cte_body, final_weights_cte)``
    where the final CTE has columns ``w0..wk``.

    Why this proves something: a green driver row means the quantized
    gradient sums, the weight recurrence, and the scoring fold are all
    bit-identical across two independent engines — the invariant that
    makes the trained model reproducible across reruns and reshards at
    100 TB."""
    k = len(feature_cols) + 1
    feats = ["CAST(1.0 AS DOUBLE)"] + [f"({c})" for c in feature_cols]
    lr_l, q_l = _dlit(float(lr)), _dlit(float(quant))

    def w_sql(i: int, j: int) -> str:
        # weight j as an expression at iteration i (0 = init literal)
        if i == 0:
            return _dlit(float(init))
        return f"_w{i}.w{j}"

    parts, prev_w_cte = [], None
    for i in range(iters):
        weights = [w_sql(i, j) for j in range(k)]
        z = "(" + " + ".join(
            [weights[0]]
            + [f"{w} * ({c})" for w, c in zip(weights[1:], feature_cols)]
        ) + ")"
        p = fast_sigmoid_sql(z)
        err = f"({p} - CAST(({label_col}) AS DOUBLE))"
        sums = ", ".join(
            f"SUM(CAST(floor({err} * {f} * {q_l}) AS BIGINT)) AS s{j}"
            for j, f in enumerate(feats)
        )
        src = f"{feat_cte}" + (
            f" CROSS JOIN _w{i}" if prev_w_cte else ""
        )
        parts.append(
            f"_g{i} AS (SELECT COUNT(1) AS n, {sums} FROM {src})"
        )
        upd = ", ".join(
            f"{w_sql(i, j)} - {lr_l} * ((CAST(s{j} AS DOUBLE) / {q_l})"
            f" / n) AS w{j}"
            for j in range(k)
        )
        src_w = f"_g{i}" + (f" CROSS JOIN _w{i}" if prev_w_cte else "")
        parts.append(f"_w{i + 1} AS (SELECT {upd} FROM {src_w})")
        prev_w_cte = f"_w{i + 1}"
    return ", ".join(parts), prev_w_cte


def classifier_score_sql(
    weights_cte: str,
    feature_cols: list[str],
    n_features: int,
    decimals: int = 6,
) -> str:
    """Scoring expression against the final weights CTE (cross-joined
    single row): mirrors :func:`score_linear` bit-for-bit."""
    z = "(" + " + ".join(
        [f"{weights_cte}.w0"]
        + [
            f"{weights_cte}.w{j + 1} * ({c})"
            for j, c in enumerate(feature_cols[:n_features])
        ]
    ) + ")"
    return f"round({fast_sigmoid_sql(z)}, {decimals})"
