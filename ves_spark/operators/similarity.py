"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast nested-loop with the
dot product as a JVM higher-order fold (exact, and the correctness
oracle for the approximate paths).

Scale path: random-hyperplane LSH bucketing — queries only compare
against their bucket (and optionally neighboring probes), turning the
n×m pair space into per-bucket joins keyed by a small int.

All float math is float→double cast, sequential fold, so results are
bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ves_spark.operators.crossengine import dlit as _dlit
from ves_spark.operators.spread import spread


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (JVM HOF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# --- fixed-dimension codegen'd variants -------------------------------
#
# The HOF fold (aggregate/zip_with) runs INTERPRETED per element; for a
# known dim the same fold unrolls into a flat arithmetic expression that
# whole-stage codegen compiles (guide §4.1). Bit-identical to the fold:
# SQL `+` is left-associative, so `0.0 + p0 + p1 + ...` is the exact
# IEEE-754 op sequence of `aggregate(..., 0.0, acc + p)`. Out-of-range
# subscripts yield NULL (non-ANSI), matching zip_with's NULL padding on
# short arrays — callers pass the true fixed dim.


def _dot_fixed_sql(a: str, b: str, dim: int) -> str:
    terms = " + ".join(
        f"CAST(`{a}`[{d}] AS DOUBLE) * CAST(`{b}`[{d}] AS DOUBLE)"
        for d in range(dim)
    )
    return f"(CAST(0 AS DOUBLE) + {terms})"


def dot_fixed(a: str, b: str, dim: int) -> Column:
    """Codegen'd :func:`dot` for fixed-length arrays (bit-identical)."""
    return F.expr(_dot_fixed_sql(a, b, dim))


def norm_fixed(a: str, dim: int) -> Column:
    """Codegen'd :func:`l2_norm` for fixed-length arrays
    (bit-identical: same left fold under the same sqrt)."""
    terms = " + ".join(
        f"CAST(`{a}`[{d}] AS DOUBLE) * CAST(`{a}`[{d}] AS DOUBLE)"
        for d in range(dim)
    )
    return F.expr(f"sqrt(CAST(0 AS DOUBLE) + {terms})")


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set
    against the corpus, cosine per pair, window top-k. Ties broken by
    corpus id for determinism. Columns: (q_id, c_id, cos, rnk).

    ``dim`` (when known) switches the per-pair cosine to the unrolled
    codegen'd fold with per-ROW norms hoisted out of the pair loop —
    dot/(n_q * n_c) with each norm computed once per input row is the
    same IEEE op sequence per pair as the inline cosine."""
    if dim is None:
        pairs = corpus.crossJoin(F.broadcast(queries)).filter(
            F.col(q_id) != F.col(c_id)
        )
        scored = pairs.select(
            q_id,
            c_id,
            F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cos"),
        )
    else:
        qn = queries.withColumn("_nq", norm_fixed(q_vec, dim))
        cn = spread(corpus, c_id).withColumn("_nc", norm_fixed(c_vec, dim))
        pairs = cn.crossJoin(F.broadcast(qn)).filter(F.col(q_id) != F.col(c_id))
        scored = pairs.select(
            q_id,
            c_id,
            F.round(
                dot_fixed(q_vec, c_vec, dim) / (F.col("_nq") * F.col("_nc")), 6
            ).alias("cos"),
        )
    w = W.partitionBy(q_id).orderBy(F.col("cos").desc(), F.col(c_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _planes(dim: int, n_planes: int, seed: int = 1234) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature as a small int: bit b = sign of
    dot(vec, plane_b). Deterministic (planes seeded on the driver and
    inlined as literals — broadcast-equivalent)."""
    bucket = F.lit(0)
    for b, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def _table_buckets(vec: Column, tables: list[list[list[float]]]) -> Column:
    """array of (table_idx, bucket) structs — one bucket per table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"), lsh_bucket(vec, planes).alias("bkt")
            )
            for t, planes in enumerate(tables)
        ]
    )


def _table_buckets_matmul(tables: list[list[list[float]]]):
    """Arrow-vectorized bucket assignment: ONE numpy matmul per batch
    computes every (table, plane) dot product — the 100 TB path (the
    JVM HOF fold is O(T·P·d) interpreted ops per row; this is a BLAS
    (batch × d) @ (d × T·P)). Sign-bit packing per table gives the
    bucket ids. Float summation order differs from the sequential
    fold, so dots within ~1e-13 of zero may bucket differently —
    recall-equivalent, not bit-identical (the oracle-checked query
    uses the fold)."""
    import numpy as np
    import pandas as pd

    P = np.asarray(tables, dtype=np.float64)  # (T, nplanes, d)
    T, nplanes, d = P.shape
    flat = P.reshape(T * nplanes, d)
    weights = (1 << np.arange(nplanes, dtype=np.int64))

    def kernel(vecs):
        M = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, d)
        bits = (M @ flat.T) > 0  # (n, T*nplanes)
        bkts = bits.reshape(len(M), T, nplanes).astype(np.int64) @ weights
        return pd.Series(list(bkts.astype(np.int32)))

    # no type hints: the closure-scoped kernel uses the legacy SCALAR
    # pandas_udf path (hint strings would not resolve in this scope)
    from pyspark.sql.functions import PandasUDFType

    return F.pandas_udf(kernel, "array<int>", PandasUDFType.SCALAR)


def _bucketize_exploded(
    df: DataFrame, id_col: str, vec_col: str, tables: list[list[list[float]]]
) -> DataFrame:
    """Bit-exact bucket assignment in whole-stage codegen: posexplode
    the vector, broadcast-join a tiny (dim x planes) literal table, and
    sum the products per id. Within a partition the exploded elements
    of one vector are contiguous and the partial hash-aggregate
    accumulates them in row order, so each dot is the SAME sequential
    left fold as F.aggregate — verified bit-for-bit against the DuckDB
    oracle — but multiply-adds run codegen'd instead of interpreted
    (~5x on the corpus side)."""
    spark = df.sparkSession
    T, P = len(tables), len(tables[0])
    rows = [
        (i, *[float(tables[t][p][i]) for t in range(T) for p in range(P)])
        for i in range(len(tables[0][0]))
    ]
    cols = [f"pl_{t}_{p}" for t in range(T) for p in range(P)]
    planes_df = spark.createDataFrame(rows, ["pos", *cols])
    ex = df.select(
        id_col, vec_col, F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).join(F.broadcast(planes_df), "pos")
    dots = ex.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col),
        *[
            F.sum(F.col("x").cast("double") * F.col(c)).alias(f"dot_{c}")
            for c in cols
        ],
    )
    bkts = [
        sum(
            F.when(F.col(f"dot_pl_{t}_{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(P)
        ).alias(f"bkt_{t}")
        for t in range(T)
    ]
    wide = dots.select(id_col, vec_col, *bkts)
    return wide.select(
        id_col,
        vec_col,
        F.posexplode(F.array(*[F.col(f"bkt_{t}") for t in range(T)])).alias(
            "tbl", "bkt"
        ),
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 1234,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    bucket_impl: str = "fold",  # 'fold'|'exploded' (bit-exact) | 'matmul' (Arrow)
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: a pair
    is a candidate if it collides in ANY of ``n_tables`` independent
    tables (recall 1-(1-p^b)^L for per-bit agreement p). Cost/recall
    dials: n_planes (bucket granularity) × n_tables (redundancy).
    Same output schema as the brute-force baseline.

    Scale shape: candidates come from an equi-join on (table, bucket)
    — the corpus is never compared against out-of-bucket queries, and
    the shuffle key is a small int pair. ``bucket_impl='matmul'`` is
    the production bucket assigner (one BLAS matmul per Arrow batch);
    'fold' is the deterministic sequential-fold spec the DuckDB oracle
    replicates bit-for-bit."""
    tables = [
        _planes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)
    ]
    corpus = spread(corpus, c_id)
    if bucket_impl == "matmul":
        kern = _table_buckets_matmul(tables)

        def bucketize(df, idc, vecc):
            return df.select(
                idc, vecc, F.posexplode(kern(F.col(vecc))).alias("tbl", "bkt")
            )

        qb = bucketize(queries, q_id, q_vec)
        cb = bucketize(corpus, c_id, c_vec)
    elif bucket_impl == "exploded":
        qb = _bucketize_exploded(queries, q_id, q_vec, tables)
        cb = _bucketize_exploded(corpus, c_id, c_vec, tables)
    else:
        qb = queries.select(
            q_id, q_vec, F.explode(_table_buckets(F.col(q_vec), tables)).alias("_tb")
        ).select(q_id, q_vec, "_tb.tbl", "_tb.bkt")
        cb = corpus.select(
            c_id, c_vec, F.explode(_table_buckets(F.col(c_vec), tables)).alias("_tb")
        ).select(c_id, c_vec, "_tb.tbl", "_tb.bkt")
    # per-ROW norms ride the bucketized frames so the per-pair cosine
    # is one codegen'd dot + one divide (same IEEE sequence: each norm
    # is computed from the same row value either way)
    qb = qb.withColumn("_nq", norm_fixed(q_vec, dim))
    cb = cb.withColumn("_nc", norm_fixed(c_vec, dim))
    pairs = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, q_vec, c_vec, "_nq", "_nc")
        .dropDuplicates([q_id, c_id])
    )
    scored = pairs.select(
        q_id,
        c_id,
        F.round(
            dot_fixed(q_vec, c_vec, dim) / (F.col("_nq") * F.col("_nc")), 6
        ).alias("cos"),
    )
    w = W.partitionBy(q_id).orderBy(F.col("cos").desc(), F.col(c_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def _assign_nearest(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    c_id: str,
    c_vec: str,
) -> DataFrame:
    """Nearest-centroid assignment with the k·dim multiply-adds in
    whole-stage codegen: posexplode the vector, broadcast-join a tiny
    (dim × k) literal weight table, and sum x·w_c per (row, centroid)
    — the `_bucketize_exploded` pattern. The single flat k×dim argmax
    expression this replaces EXCEEDED the JVM's 64 KB method limit at
    k=32, dim=64 ("Code grows beyond 64 KB"), so the whole projection
    fell back to interpreted evaluation AND paid a failed janino
    compile per distinct centroid set (every training iteration);
    here each of the k sums is its own split-able codegen expression.

    Bit-identical to the fold/window formulation: within a partition
    the exploded elements of one vector are contiguous and in position
    order, and the partial hash-aggregate accumulates them in row
    order, so each dot (and the row norm, summed in the same pass) is
    the SAME sequential left fold — the oracle replays k-means
    training bit-for-bit on top of this. Each centroid's norm is
    computed on the DRIVER with the identical left-to-right double
    fold; the struct max (cos, -cent_id) replicates the ORDER BY cos
    DESC, cent_id ASC tiebreak exactly.
    Returns (c_id, c_vec, cent_id)."""
    import math

    def _norm(vec: list[float]) -> float:
        acc = 0.0
        for x in vec:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    spark = df.sparkSession
    dim = len(cents[0][1])
    wcols = [f"_w{i}" for i in range(len(cents))]
    wdf = spark.createDataFrame(
        [
            (d, *[float(vec[d]) for _, vec in cents])
            for d in range(dim)
        ],
        ["pos", *wcols],
    )
    ex = df.select(
        c_id, c_vec, F.posexplode(F.col(c_vec)).alias("pos", "x")
    ).join(F.broadcast(wdf), "pos")
    xd = F.col("x").cast("double")
    agg = ex.groupBy(c_id).agg(
        F.first(c_vec).alias(c_vec),
        F.sum(xd * xd).alias("_nn"),
        *[F.sum(xd * F.col(w)).alias(f"_d{i}") for i, w in enumerate(wcols)],
    )
    # the argmax itself now only references the k dot columns — a
    # small expression that compiles. sqrt(_nn) == norm_fixed == the
    # l2_norm fold (same summation order under the same sqrt).
    structs = ", ".join(
        f"named_struct('c', _d{i} / (sqrt(_nn) * {_dlit(_norm(vec))}), "
        f"'nid', CAST({-int(cid)} AS BIGINT))"
        for i, (cid, vec) in enumerate(cents)
    )
    best = F.expr(f"array_max(array({structs}))")
    return agg.select(c_id, c_vec, (-best["nid"]).alias("cent_id"))



def _dot_literal_sql(vec_col: str, vec: list[float]) -> str:
    """SQL text of ``dot(col, literal_vec)`` with the vector inlined
    as exact double literals — UNROLLED so whole-stage codegen
    compiles it (the zip_with/aggregate fold it replaces ran
    interpreted per element). Bit-identical: `0.0 + p0 + p1 + ...` is
    the fold's exact left-associative IEEE op sequence, and
    `CAST(lit AS DOUBLE)` on an already-double literal was a no-op in
    the old lambda."""
    terms = " + ".join(
        f"CAST(`{vec_col}`[{d}] AS DOUBLE) * {_dlit(float(x))}"
        for d, x in enumerate(vec)
    )
    return f"(CAST(0 AS DOUBLE) + {terms})"


def train_kmeans_centroids(
    corpus: DataFrame,
    k: int = 32,
    iters: int = 2,
    dim: int = 64,
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    quant: int = 1 << 20,
) -> list[tuple[int, list[float]]]:
    """Seeded Lloyd k-means over an embedding column, cross-engine
    EXACT — every step is reproducible bit-for-bit in another engine
    (the DuckDB oracle replays it), which takes three choices:

    * init: Forgy-style seeded sample — the ``k`` corpus vectors with
      the smallest (md5₃₂(id), id), a deterministic stand-in for
      uniform random pick. (k-means|| oversampling is the production
      upgrade; it is equally replayable — distances are deterministic
      — just heavier to unroll in the oracle SQL.)
    * assign: argmax of the sequential-fold double cosine, ties to the
      smaller cent_id — identical in any engine.
    * update: the mean is computed from INTEGER sums — each component
      is scaled by 2^20 (exponent shift: exact for doubles) and
      floored to a long, so the per-cluster sum is order-independent
      and exact, then one double division yields the new component.
      Quantization error ≤ 2^-20 per component; float mean order-
      dependence (the cross-engine killer) is gone.

    Returns driver-side (cent_id, vector) literals — k·dim doubles,
    metadata-sized — so callers broadcast a literal table and oracle
    SQL can be generated against the same construction. Scale shape:
    each iteration is one map-side argmax projection over the k
    centroid literals (``_assign_nearest`` — no crossJoin, no n×k
    shuffle) + one map-side-combined groupBy with k·dim long sums;
    only k rows ever reach the driver."""
    corpus = spread(corpus, c_id)  # file-limited scans: see spread.py
    h = F.conv(
        F.substring(F.md5(F.col(c_id).cast("string")), 1, 8), 16, 10
    ).cast("long")
    # Single generated-SQL projections/aggregates throughout: the
    # per-dimension Column constructions were ~4*dim py4j calls each,
    # dominating training wall on the driver (values unchanged —
    # identical expressions, parsed instead of built node-by-node).
    cast_arr = ", ".join(
        f"CAST(`{c_vec}`[{d}] AS DOUBLE)" for d in range(dim)
    )
    seeds = (
        corpus.select(
            F.col(c_id).alias("cent_id"),
            F.expr(f"array({cast_arr})").alias("cent_vec"),
            h.alias("_h"),
        )
        .orderBy("_h", "cent_id")  # TakeOrdered: distributed top-k
        .limit(k)
        .drop("_h")
    )
    cents = [(r["cent_id"], list(r["cent_vec"])) for r in seeds.collect()]

    # Update step: per-cluster integer sums of floor(x_d * 2^20),
    # computed LONG — order-independent, so any regrouping is exact.
    # The sums ride a posexplode + ONE narrow sum aggregate keyed by
    # (cent_id, pos) instead of a 65-function named_struct aggregate:
    # the wide form pushed the fused stage past codegen's field limit
    # and the whole assign+update pipeline fell back to interpreted
    # eval (measured ~6 s/iteration on 24k rows; the narrow form runs
    # the identical floor/cast arithmetic in whole-stage codegen).
    # k*dim rows reach the driver — metadata-sized either way.
    for _ in range(iters):
        assign = _assign_nearest(corpus, cents, c_id, c_vec)
        stats = (
            assign.select(
                "cent_id", F.posexplode_outer(F.col(c_vec)).alias("pos", "x")
            )
            .groupBy("cent_id", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("x").cast("double") * F.lit(float(quant)))
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        # cluster size = vectors with a pos-0 element plus empty-array
        # vectors (posexplode_outer emits a NULL-pos row for those) —
        # exactly the old count(1) over cluster rows. Sums skip NULLs
        # exactly like the old per-dim sum over out-of-range derefs.
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        for r in stats.collect():
            if r["pos"] is None or r["pos"] == 0:
                counts[r["cent_id"]] = counts.get(r["cent_id"], 0) + r["n"]
            if r["pos"] is not None and r["s"] is not None:
                sums.setdefault(r["cent_id"], [0] * dim)[r["pos"]] = r["s"]
        upd = {
            cid: [s[d] / (quant * counts[cid]) for d in range(dim)]
            for cid, s in sums.items()
        }
        # empty cluster: keep the previous centroid (deterministic,
        # replicated by the oracle's LEFT JOIN + COALESCE)
        cents = [(cid, upd.get(cid, vec)) for cid, vec in cents]
    return cents


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cents: int = 32,
    train_iters: int = 2,
    n_probe: int = 4,
    dim: int = 64,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization —
    the second scale path next to LSH: every corpus vector is assigned
    to its nearest coarse centroid once (the inverted lists), and a
    query only scores the lists of its ``n_probe`` nearest centroids.

    Centroids are trained with seeded Lloyd k-means
    (``train_kmeans_centroids``) — real data-adaptive cells, yet
    exactly reproducible in any engine (the DuckDB oracle replays the
    training bit-for-bit thanks to the integer-sum mean).

    Scale shape: the centroid table is tiny (k rows of literals) and
    BROADCAST — assignment is one map-side pass over the corpus
    (n x k multiply-adds, the standard IVF build cost, BLAS-able
    via the matmul kernel pattern above); the probe join is an
    equi-join on ``cent_id``, so a query never touches out-of-list
    candidates and the shuffle key is one small int."""
    # one materialization feeds every training iteration, the final
    # assignment and the probe scoring — without it each of the ~10
    # blocking jobs below re-scans and re-unions the corpus
    corpus = spread(corpus, c_id).localCheckpoint(eager=True)
    trained = train_kmeans_centroids(
        corpus, k=n_cents, iters=train_iters, dim=dim, c_id=c_id, c_vec=c_vec
    )
    cents = corpus.sparkSession.createDataFrame(
        trained, "cent_id long, cent_vec array<double>"
    )

    def nearest(df, idc, vecc, top):
        scored = df.crossJoin(F.broadcast(cents)).select(
            idc,
            vecc,
            "cent_id",
            (
                dot_fixed(vecc, "cent_vec", dim)
                / (norm_fixed(vecc, dim) * norm_fixed("cent_vec", dim))
            ).alias("_ccos"),
        )
        w = W.partitionBy(idc).orderBy(F.col("_ccos").desc(), F.col("cent_id"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top)
            .drop("_rn", "_ccos")
        )

    # inverted lists: map-side argmax over the centroid literals (the
    # big side never shuffles); the query probe set keeps the window
    # top-n_probe (the query side is small by construction)
    assign = _assign_nearest(corpus, trained, c_id, c_vec).withColumn(
        "_nc", norm_fixed(c_vec, dim)
    )
    probes = nearest(queries, q_id, q_vec, n_probe).withColumn(
        "_nq", norm_fixed(q_vec, dim)
    )
    # probes = n_queries × n_probe rows — small by construction; the
    # hint keeps the candidate join a BroadcastHashJoin on cent_id
    # (post-aggregation size estimates would otherwise pick SMJ)
    pairs = (
        assign.join(F.broadcast(probes), "cent_id")
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, q_vec, c_vec, "_nq", "_nc")
    )
    scored = pairs.select(
        q_id,
        c_id,
        F.round(
            dot_fixed(q_vec, c_vec, dim) / (F.col("_nq") * F.col("_nc")), 6
        ).alias("cos"),
    )
    w = W.partitionBy(q_id).orderBy(F.col("cos").desc(), F.col(c_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 1234,
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    bucket_impl: str = "exploded",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-family member
    for embedding columns): unordered id pairs with cosine >=
    ``threshold``, candidates from a multi-table LSH self-join — the
    same (table, bucket) equi-join shape as ``cosine_topk_lsh``, so
    the corpus is never compared all-pairs. Approximate in the LSH
    sense: a true near-dup pair is found iff it collides in >= 1
    table (recall 1-(1-p^b)^L); every returned pair's cosine is exact.
    Columns: (id_a, id_b, cos) with id_a < id_b."""
    tables = [_planes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)]
    corpus = spread(corpus, c_id)
    if bucket_impl == "exploded":
        cb = _bucketize_exploded(corpus, c_id, c_vec, tables)
    else:
        cb = corpus.select(
            c_id, c_vec, F.explode(_table_buckets(F.col(c_vec), tables)).alias("_tb")
        ).select(c_id, c_vec, "_tb.tbl", "_tb.bkt")
    # A broadcast-probe rework (the near_pairs_from_sig / ngram
    # pattern) was tried here and reverted: interleaved A/B at both
    # sf0.1 and the sf1.0 replica showed warm parity (the bucketize
    # kernel dominates this operator, not the pair join — the
    # (tbl, bkt) fan-out is small at both scales) while the extra
    # count job + broadcast build cost real wall on cold runs.
    cb = cb.withColumn("_n", norm_fixed(c_vec, dim))
    a = cb.select(
        F.col(c_id).alias("id_a"), F.col(c_vec).alias("_va"),
        F.col("_n").alias("_na"), "tbl", "bkt",
    )
    b = cb.select(
        F.col(c_id).alias("id_b"), F.col(c_vec).alias("_vb"),
        F.col("_n").alias("_nb"), "tbl", "bkt",
    )
    pairs = (
        a.join(b, ["tbl", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                dot_fixed("_va", "_vb", dim) / (F.col("_na") * F.col("_nb")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_cents: int = 32,
    train_iters: int = 2,
    dim: int = 64,
    c_id: str = "c_id",
    c_vec: str = "c_vec",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then prune
    near-duplicates WITHIN each cluster only — the cluster bound is
    what makes embedding dedup tractable at corpus scale (the pair
    space shrinks from n^2 to sum over clusters of n_c^2, and a pair
    of semantic dups lands in the same cluster with high probability
    because both sit near the same centroid).

    Keep rule (deterministic, cross-engine): a document is DROPPED iff
    some same-cluster partner with a SMALLER id has cosine >=
    ``threshold`` to it — greedy keep-lowest-id, applied in one pass
    (a dropped doc still shadows its own higher-id neighbors; the rule
    is "exists smaller near-neighbor", not transitive closure — that
    clustering variant is ``connected_components`` over the pair
    graph, already available for the exact-dup family).

    Scale shape: centroids come from ``train_kmeans_centroids``
    (broadcast literals, exactly replayable by an oracle); assignment
    is one map-side broadcast crossJoin over k centroids; the
    within-cluster pair generation is an equi-join on ``cent_id`` —
    the shuffle key is one small int, never an all-pairs product, and
    AQE's skew split handles an oversized cluster. Returns the KEPT
    rows as (c_id, cent_id)."""
    corpus = spread(corpus, c_id).localCheckpoint(eager=True)
    trained = train_kmeans_centroids(
        corpus, k=n_cents, iters=train_iters, dim=dim, c_id=c_id, c_vec=c_vec
    )
    # map-side argmax assignment — the corpus never shuffles here; the
    # only exchange in the whole operator is the cent_id pair join.
    # localCheckpoint: the assignment feeds BOTH sides of the pair
    # self-join and the final anti-join — without it the k-way argmax
    # projection runs three times over the corpus (and the per-row
    # norm rides the materialized frame into every pair). The explicit
    # repartition sizes the pair join by COMPUTE, not bytes: the
    # within-cluster self-join fans out |cluster|^2 cosines from a
    # byte-tiny input, which AQE's byte-based coalescing would happily
    # squeeze onto one task; partition count follows the session's
    # parallelism, never a constant.
    import os

    n_parts = corpus.sparkSession.sparkContext.defaultParallelism
    assign = (
        _assign_nearest(corpus, trained, c_id, c_vec)
        .withColumn("_n", norm_fixed(c_vec, dim))
        .localCheckpoint(eager=True)
    )
    a = assign.select(
        F.col(c_id).alias("id_a"), F.col(c_vec).alias("_va"),
        F.col("_n").alias("_na"), "cent_id",
    )
    b = assign.select(
        F.col(c_id).alias("id_b"), F.col(c_vec).alias("_vb"),
        F.col("_n").alias("_nb"), "cent_id",
    )
    bcast_cap = int(
        os.environ.get("SPARK_GRAFT_SEMDEDUP_BCAST_ROWS", str(500_000))
    )
    if assign.count() <= bcast_cap:
        # Broadcast-probe pair generation: the probe side is
        # partitioned by id_b (the dropped-side id), the a-side rides
        # a broadcast, so per-probe-row work is one scan of its
        # cluster's bucket — cluster-size skew spreads over ALL
        # partitions instead of landing whole-cluster^2 on one task
        # (measured: the cent_id equi-join ran its ~9M cosines on 4
        # tasks), and HashPartitioning(id_b) satisfies the distinct's
        # ClusteredDistribution — no exchange after the fan-out.
        dropped = (
            b.repartition(n_parts, "id_b")
            .join(F.broadcast(a), "cent_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                dot_fixed("_va", "_vb", dim) / (F.col("_na") * F.col("_nb"))
                >= threshold
            )
            .select(F.col("id_b").alias(c_id))
            .distinct()
        )
    else:
        # 100 TB path: equi-join on cent_id (AQE skew-split handles an
        # oversized cluster), pinned to the session's parallelism —
        # the byte-tiny exchange fans out |cluster|^2 cosines, which
        # AQE's byte-based coalescing would run on one task.
        dropped = (
            a.repartition(n_parts, "cent_id")
            .join(b.repartition(n_parts, "cent_id"), "cent_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                dot_fixed("_va", "_vb", dim) / (F.col("_na") * F.col("_nb"))
                >= threshold
            )
            .select(F.col("id_b").alias(c_id))
            .distinct()
        )
    return assign.join(dropped, c_id, "left_anti").select(c_id, "cent_id")
