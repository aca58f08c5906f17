"""Distribution drift between two corpus snapshots (PSI).

The between-epochs companion to ``operators/anomaly.py`` (which scores
one table over time): before a new crawl/epoch joins the training mix,
compare its feature distributions against the reference corpus and
flag the features that moved. The standard score is the Population
Stability Index, PSI = Σ (p_i − q_i)·ln(p_i/q_i) over shared bins —
symmetric KL, ≥ 0, conventional thresholds 0.1 (moderate) / 0.25
(major shift).

Reference basis: the per-source row/byte counters the reference
exports (`src/tailer/manager.rs:21-29`) are exactly the per-snapshot
marginals this operator compares; deciding "this epoch looks
different" is the unimplemented consumer side, same as the spike
detector.

Spark shape — nothing here shuffles the corpus:

* numeric columns: bin edges are equi-depth quantiles of the
  REFERENCE (one ``approxQuantile`` pass, driver state = bins−1
  doubles), both sides then bucketize map-side and aggregate to
  bins-sized histograms (map-side combine; shuffle = bins rows);
* categorical columns: one groupBy per side over the value domain
  (shuffle = distinct values), low-frequency tail capped by
  ``max_categories`` into an ``__other__`` bucket so a high-cardinality
  column cannot blow the result size;
* the PSI fold itself runs on bins-sized frames — driver-scale.

Bins empty on one side get ``eps`` mass (the standard smoothing;
PSI is undefined at zero), so a category appearing only in the new
epoch contributes a large-but-finite term instead of infinity.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OTHER = "__other__"
NULL_BUCKET = "__null__"


def _shares_categorical(
    df: DataFrame, col: str, keep: list[str]
) -> dict[str, float]:
    """value -> share, with values outside ``keep`` folded into
    ``__other__``. One map-side-combined groupBy; result is
    len(keep)+1 rows on the driver."""
    k = F.when(F.col(col).isin(keep), F.col(col).cast("string")).otherwise(
        F.lit(OTHER)
    )
    rows = df.select(k.alias("_k")).groupBy("_k").count().collect()
    total = sum(r["count"] for r in rows) or 1
    return {r["_k"]: r["count"] / total for r in rows}


def _shares_binned(
    df: DataFrame, col: str, edges: list[float]
) -> dict[int, float]:
    """bin index -> share for numeric ``col`` against fixed ``edges``
    (len(edges)+1 bins, open-ended at both extremes). Bucketization is
    a codegen'd nested when-chain riding the scan; the aggregate ships
    one partial histogram per task."""
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col(col).cast("double") <= F.lit(float(e)), b).otherwise(
            F.lit(i + 1)
        )
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("_b"))
        .groupBy("_b")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in rows) or 1
    return {r["_b"]: r["count"] / total for r in rows}


def _psi(p: dict, q: dict, eps: float) -> float:
    """Σ (p−q)·ln(p/q) over the union of keys, eps-smoothed."""
    out = 0.0
    for k in set(p) | set(q):
        pi = max(p.get(k, 0.0), eps)
        qi = max(q.get(k, 0.0), eps)
        out += (pi - qi) * math.log(pi / qi)
    return out


def psi_table(
    df: DataFrame,
    is_cur: Column,
    buckets: dict[str, Column],
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Per-feature PSI as a single declarative plan: one ``(feature,
    psi)`` row per entry in ``buckets``, comparing the rows where
    ``is_cur`` is false (the reference epoch) against those where it
    is true (the monitored epoch).

    The fully-DataFrame sibling of :func:`population_stability` (which
    returns a driver dict and derives numeric edges from
    ``approxQuantile``): here the caller supplies every bucketization
    as an explicit Column expression, so the whole computation — and
    therefore its oracle — is deterministic and engine-replayable,
    which is what the driver's DuckDB hash-compare needs.

    Scale shape: one map-only projection per feature rides the scan
    (``buckets`` unioned legs), then ONE groupBy whose output is
    bins-sized per feature. The share normalization is a window over
    ``feature`` — it runs on the aggregated, metadata-scale frame
    (≤ categories+1 rows per feature), never on the corpus. NULL
    bucket values fold into ``__null__`` so both engines agree on the
    domain."""
    legs = [
        df.select(
            F.lit(name).alias("feature"),
            F.coalesce(expr.cast("string"), F.lit(NULL_BUCKET)).alias(
                "bucket"
            ),
            is_cur.cast("boolean").alias("_cur"),
        )
        for name, expr in buckets.items()
    ]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    h = u.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("_cur"), 0).otherwise(1)).alias("cp"),
        F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("cq"),
    )
    w = Window.partitionBy("feature")
    t = h.select(
        "feature",
        F.greatest(F.col("cp") / F.sum("cp").over(w), F.lit(eps)).alias("p"),
        F.greatest(F.col("cq") / F.sum("cq").over(w), F.lit(eps)).alias("q"),
    )
    psi = F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))
    return t.groupBy("feature").agg(F.round(psi, round_to).alias("psi"))


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    bins: int = 10,
    max_categories: int = 100,
    eps: float = 1e-6,
) -> dict[str, float]:
    """PSI per column between reference and current snapshots.

    Numeric bin edges AND the kept category set both come from the
    REFERENCE side only — the monitored epoch must not influence its
    own yardstick (else a drifted epoch partially re-normalizes
    itself). Returns ``{column: psi}``; interpret with the usual
    0.1 / 0.25 thresholds. Cost: one approxQuantile + two tiny
    aggregates per numeric column, two per categorical — each output
    is bins- or categories-sized, so the whole comparison is
    metadata-scale next to either corpus."""
    if not numeric_cols and not categorical_cols:
        raise ValueError("pass at least one column to compare")
    out: dict[str, float] = {}
    for col in numeric_cols or []:
        probs = [i / bins for i in range(1, bins)]
        edges = sorted(set(ref.approxQuantile(col, probs, 0.001)))
        out[col] = _psi(
            _shares_binned(ref, col, edges),
            _shares_binned(cur, col, edges),
            eps,
        )
    for col in categorical_cols or []:
        top = [
            r[col]
            for r in ref.filter(F.col(col).isNotNull())
            .groupBy(col)
            .count()
            .orderBy(F.col("count").desc(), F.col(col))
            .limit(max_categories)
            .collect()
        ]
        out[col] = _psi(
            _shares_categorical(ref, col, top),
            _shares_categorical(cur, col, top),
            eps,
        )
    return out
