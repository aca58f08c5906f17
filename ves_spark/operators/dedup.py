"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Generalizes the reference's dedup-by-inode (identity) to
dedup-by-content (reference src/watcher/discovery.rs:33-35: "skip if
already known"): at training-data scale the identity of a document is
a function of its content, and the checkpoint anti-join becomes a
content-hash groupBy / LSH bucket join.

Scale design:
* exact dedup shuffles 8-byte hashes, never full documents;
* MinHash bands turn the O(n²) pair space into per-bucket joins —
  the shuffle key is (band_idx, band_hash), so co-candidates land in
  the same partition and nothing else does;
* signatures are computed with JVM higher-order functions (one pass
  over the shingle array per hash), not Python;
* SimHash is a single Arrow-vectorized kernel (numpy bit matrix).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ves_spark.operators.spread import spread

# ------------------------------------------------------------------ exact


def dedup_exact(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per distinct content value.

    Shuffles on xxhash64(content) so the exchange carries 8-byte keys;
    the full content column rides only to verify within the group
    (hash collisions are broken by grouping on the content itself).
    """
    return (
        df.withColumn("_h", F.xxhash64(F.col(content_col)))
        .groupBy("_h", content_col)
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )


# --------------------------------------------------------------- shingles


def word_shingles(col, k: int = 3):
    """Distinct word k-gram shingles of a text column (JVM HOFs only).

    Measured note (round 7): hashing the k word elements directly
    inside the lambda (element_at + chained xxhash64) is ~2x SLOWER
    than this concat_ws form + one codegen'd xxhash64 after the
    explode — higher-order lambdas run interpreted, so moving hash
    work into them back-fires; keep the lambda body minimal."""
    words = F.split(col, " ")
    n = F.size(words)
    return F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        )
    )


# ---------------------------------------------------------------- minhash


def minhash_signature(shingles_col, n_hashes: int = 32):
    """MinHash signature: for each of ``n_hashes`` seeded hash
    functions, the min over the shingle set. One array expression,
    fully JVM-side; xxhash64(seed, shingle) plays the role of the
    h_i(x) = hash(x, i) family.

    The per-seed lambda MUST be built through a single-parameter
    closure: a ``lambda s, i=i`` carries arity 2, which PySpark reads
    as the (element, index) lambda form — the seed silently becomes
    the array INDEX and every slot degenerates to the same
    position-seeded min (the round-7 fix; production paths always
    used the explode + min-aggregate form and were unaffected)."""

    def _slot(i: int):
        return F.array_min(
            F.transform(shingles_col, lambda s: F.xxhash64(F.lit(i), s))
        )

    return F.array(*[_slot(i) for i in range(n_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows/band r = n_hashes/bands; two docs collide in a band iff that
    r-slice of their signatures is identical — P(collide) = s^r for
    Jaccard s, the classic S-curve. Output: (id_a, id_b) candidate
    pairs (id_a < id_b), deduped across bands. ``max_bucket`` drops
    band buckets larger than the cap before the self-join (a cluster
    of k identical docs otherwise emits O(k²) pairs in EVERY band —
    route such clusters through exact dedup instead).
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    # Signature via explode + min-aggregate, NOT the per-row
    # array_min(transform(...)) HOF: higher-order functions run
    # interpreted (n_hashes * |shingles| interpreted xxhash64 calls
    # per doc), while the exploded form hashes each shingle n_hashes
    # times inside whole-stage codegen and partial-aggregates the
    # mins map-side (guide §4.1: prefer built-ins/codegen over
    # interpreted per-element lambdas). min over the same multiset ==
    # array_min over the transform — values are bit-identical.
    ex = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), shingle_k)).alias("_s"),
    )
    sig = ex.groupBy("_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("_s"))).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    )
    # band hash: concat_ws over the r member columns produces the same
    # ","-joined string as the old transform(slice(_sig, ...)) form
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"_h{b * r + j}").cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_b.band", "_b.bh")
    banded = _cap_buckets(banded, ["band", "bh"], max_bucket)
    # The signature aggregation is the expensive producer (32 min
    # aggregates over every exploded shingle) and it feeds BOTH sides
    # of the band self-join — both sides are the same exchanged
    # subtree, so it runs once (ReusedExchange) on either plan. Below
    # the broadcast gate (cheap column-pruned INPUT count) the probe
    # side is partitioned by _id, so every candidate pair lands in
    # a's partition and the cross-band distinct runs with no pair
    # exchange (the near_pairs_from_sig / ngram pattern); above it,
    # the classic both-sides-exchanged band join.
    import os

    bcast_rows = int(
        os.environ.get("SPARK_GRAFT_PAIR_BCAST_ROWS", str(4_000_000))
    )
    if df.count() * bands <= bcast_rows:
        p = df.sparkSession.sparkContext.defaultParallelism
        banded = banded.repartition(p, "_id")
        left = banded.alias("l")
        right = F.broadcast(banded).alias("r")
    else:
        banded = spread(banded, "band", "bh", force=True)
        left = banded.alias("l")
        right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidates verified by exact shingle-set Jaccard >= threshold.
    Columns: (id_a, id_b, jaccard)."""
    cands = minhash_lsh_candidates(df, text_col, id_col, n_hashes, bands, shingle_k)
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_k).alias("_sh"),
    )
    j = (
        cands.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# ------------------------------------------------------- n-gram jaccard


# Packed (doc id, shingle count) key: id in the high bits, n in the
# low 20 — bijective while id < 2^43 and n < 2^20 (checked at runtime
# on the materialized shingle frame; the classic shuffle plan is the
# fallback). Monotone in id, and a doc's (id, n) is unique, so
# pk_a < pk_b  ⟺  id_a < id_b  for distinct docs.
_NGRAM_N_BITS = 20


def _ngram_shingle_rows(
    df: DataFrame, text_col: str, id_col: str, k: int, max_df: int | None
) -> DataFrame:
    """(pk, h) rows: one row per (doc, distinct shingle), with the doc
    id and its distinct-shingle count packed into ``pk`` and the
    8-byte xxhash64 of the shingle as ``h`` (narrow keys, guide §2.3;
    distinct shingles collide only at ~2^-64 — the same identity
    assumption the decontaminate/token-dedup hash joins document)."""
    base = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k).alias("_sh"),
    )
    # n >= 2^20 distinct shingles (a million-plus-word document) would
    # silently carry into the id bits — fail loudly instead, the
    # simhash_md5 lane-guard pattern: assert_true yields NULL on
    # success, so coalesce(…, 0) folds it into pk and keeps the check
    # in the plan. Per-row cost, negligible; id-range validity is
    # checked by the caller on a cheap id-only aggregate.
    n_guard = F.coalesce(
        F.assert_true(
            F.size("_sh") < F.lit(1 << _NGRAM_N_BITS),
            F.concat(
                F.lit("ngram_jaccard_pairs: document "),
                F.col("_id"),
                F.lit(" has >= 2^20 distinct shingles; the packed "),
                F.lit("pair key would corrupt — use the unpacked path"),
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    sh = base.select(
        "_id",
        F.size("_sh").alias("n"),
        (
            F.shiftleft(F.col("_id"), _NGRAM_N_BITS) + F.size("_sh") + n_guard
        ).alias("pk"),
        F.explode("_sh").alias("_s"),
    ).select("_id", "n", "pk", F.xxhash64("_s").alias("h"))
    if max_df is not None:
        sh = _cap_buckets(sh, ["h"], max_df)
    return sh


def _ngram_pair_counts_broadcast(sh: DataFrame, factor: int = 4) -> DataFrame:
    """(pk_a, pk_b, c) co-occurrence counts with ZERO pair shuffle:
    the probe side is hash-partitioned by ``pk`` (the a-side key), the
    whole inverted index rides a broadcast, so every (a, b) pair
    materializes in exactly a's partition — HashPartitioning(pk_a)
    satisfies the count's ClusteredDistribution(pk_a, pk_b) and Spark
    plans the 10^8-row aggregation WITHOUT an exchange, fused into the
    probe stage (measured: the pair shuffle was 129M rows / 905 MB and
    the post-shuffle aggregate the single largest stage of the query).

    Both join sides are the SAME repartitioned subtree, so the
    broadcast build reads the probe's shuffle output (ReusedExchange)
    instead of recomputing the shingles — measured ~2x on the whole
    query vs materializing the frame through localCheckpoint (this
    VM's block-store writes are page-fault-bound)."""
    p = sh.sparkSession.sparkContext.defaultParallelism * factor
    shr = sh.repartition(p, "pk")
    probe = shr.alias("a")
    build = F.broadcast(shr).alias("b")
    return (
        probe.join(
            build,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pk_a"), F.col("b.pk").alias("pk_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _ngram_pair_counts_kernel(sh: DataFrame, threshold: float) -> DataFrame:
    """(pk_a, pk_b, c) co-occurrence counts for pairs that can still
    reach ``jaccard >= threshold``, computed by a numpy posting-list
    kernel (guide §4.2: hand whole batches to vectorized native code)
    instead of the JVM broadcast join + double in-stage hash
    aggregate.

    The inverted index — (pk, h), one row per (doc, distinct
    shingle) — is collected once (Arrow) and broadcast as two numpy
    arrays sorted by pk. Each of P tasks takes a pk-aligned slice of
    the index as its probe set (a document's rows never split across
    tasks, so every (a, b) pair materializes — and is counted
    COMPLETELY — in exactly a's task): per probe row, same-h partners
    come from one vectorized ``searchsorted`` into the h-sorted view,
    candidate pairs from a ragged-range gather, counts from one
    ``lexsort`` + run-length pass. Only pairs surviving the sound
    pre-filters (c >= 2 OR both docs tiny, and raw jaccard >=
    threshold - 1e-4 — a strict superset of the final
    round-to-4-digits filter, which the caller still applies in SQL)
    cross back into the JVM: thousands of rows instead of ~10^8.

    Exactness: counting is exact integer arithmetic over the same
    (pk, h) rows the JVM join would see; the pre-filters only discard
    pairs the final filter provably discards. Driver memory is the
    collected index (16 bytes/row — the caller's doc-count gate
    bounds it)."""
    import numpy as np

    spark = sh.sparkSession
    pdf = sh.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], "pk_a long, pk_b long, c long")
    pk_all = pdf["pk"].to_numpy(dtype=np.int64)
    h_all = pdf["h"].to_numpy(dtype=np.int64)
    order = np.argsort(pk_all, kind="stable")
    pk_p, h_p = pk_all[order], h_all[order]
    h_order = np.argsort(h_all, kind="stable")
    h_s, pk_by_h = h_all[h_order], pk_all[h_order]
    n_rows = len(pk_p)
    p = spark.sparkContext.defaultParallelism * 4
    # slice boundaries aligned to pk changes: a doc's rows stay whole
    cuts = np.searchsorted(pk_p, pk_p[np.linspace(0, n_rows - 1, p + 1).astype(np.int64)], side="left")
    cuts[-1] = n_rows
    cuts = np.unique(cuts)
    bc = spark.sparkContext.broadcast((pk_p, h_p, h_s, pk_by_h, cuts))
    n_mask = (1 << _NGRAM_N_BITS) - 1
    c1_bound = 1.0 + 1.0 / max(threshold - 1e-4, 1e-9)
    slack_t = threshold - 1e-4

    def kernel(batches):
        pk_p, h_p, h_s, pk_by_h, cuts = bc.value
        for b in batches:
            for i in b.column(0).to_numpy():
                lo_i, hi_i = int(cuts[i]), int(cuts[i + 1])
                if hi_i <= lo_i:
                    continue
                pka = pk_p[lo_i:hi_i]
                ha = h_p[lo_i:hi_i]
                lo = np.searchsorted(h_s, ha, side="left")
                hi = np.searchsorted(h_s, ha, side="right")
                cnt = hi - lo
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                # ragged-range gather: indices [lo_j, hi_j) per probe row
                reps = np.repeat(np.arange(len(ha)), cnt)
                offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                idx = (
                    np.arange(tot)
                    - np.repeat(offs, cnt)
                    + np.repeat(lo, cnt)
                )
                a_rep = pka[reps]
                b_cand = pk_by_h[idx]
                keep = b_cand > a_rep
                a_rep, b_cand = a_rep[keep], b_cand[keep]
                if len(a_rep) == 0:
                    continue
                so = np.lexsort((b_cand, a_rep))
                a_rep, b_cand = a_rep[so], b_cand[so]
                new = np.flatnonzero(
                    (np.diff(a_rep) != 0) | (np.diff(b_cand) != 0)
                )
                starts = np.concatenate(([0], new + 1))
                c = np.diff(np.concatenate((starts, [len(a_rep)])))
                pa, pb = a_rep[starts], b_cand[starts]
                na, nb = pa & n_mask, pb & n_mask
                raw = c / (na + nb - c)
                keep2 = ((c >= 2) | ((na + nb) <= c1_bound)) & (raw >= slack_t)
                if not keep2.any():
                    continue
                yield pa[keep2], pb[keep2], c[keep2]

    def kernel_arrow(batches):
        import pyarrow

        for pa_, pb_, c_ in kernel(batches):
            yield pyarrow.RecordBatch.from_arrays(
                [pyarrow.array(pa_), pyarrow.array(pb_), pyarrow.array(c_)],
                names=["pk_a", "pk_b", "c"],
            )

    tasks = spark.range(0, len(cuts) - 1, 1, numPartitions=len(cuts) - 1)
    return tasks.mapInArrow(kernel_arrow, "pk_a long, pk_b long, c long")


def _ngram_pair_counts_shuffle(sh: DataFrame, factor: int = 4) -> DataFrame:
    """The 100 TB plan for the same (pk_a, pk_b, c) counts: both sides
    exchange on the shingle hash (the inverted index no longer fits a
    broadcast), pairs shuffle to a count aggregate. The exchange is
    pinned at ``factor``x the session parallelism: the pair fan-out is
    compute-bound (sum over shingles of df^2), which AQE's byte-based
    coalescing would run on one task."""
    sh = spread(sh, "h", force=True, factor=factor)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("pk_a"), F.col("b.pk").alias("pk_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    broadcast_index_rows: int | None = None,
) -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold via an inverted
    index: explode distinct shingles, self-join on shingle, count
    co-occurrences, then |A∩B| / (|A|+|B|-|A∩B|).

    The self-join key is the shingle — at scale a stop-shingle blows
    up the join, so ``max_df`` drops shingles appearing in more than
    that many documents BEFORE the self-join (the classic df-cut;
    intersections lose those shingles, making the jaccard a lower
    bound — sound for >= threshold pruning of rare-shingle pairs).
    Default None computes the exact statistic (oracle parity).

    Plan shape (guide §2.3/§2.4, measured at sf1.0 — 2.6M shingle
    rows, 129M co-occurrence rows, ~115M DISTINCT doc pairs of which
    the overwhelming majority share exactly ONE shingle):

    * the (id, shingle-count) pair rides ONE packed long key, so the
      pair aggregation keys are 2 longs and the jaccard filter needs
      NO size-lookup joins afterwards — n_a/n_b decode straight out of
      the grouping keys;
    * the shingle computation runs ONCE: both self-join sides are the
      same repartitioned subtree, so the second consumer reads the
      first's shuffle output (ReusedExchange) — materializing through
      localCheckpoint instead measured ~2x slower on this VM's
      page-fault-bound block store;
    * when the inverted index fits executor memory
      (``broadcast_index_rows`` — a DOC-count gate, default
      parameterised via SPARK_GRAFT_NGRAM_BCAST_DOCS), the pair COUNT
      aggregation runs with no exchange at all
      (``_ngram_pair_counts_broadcast``); above the cap it degrades
      to the classic both-sides-exchanged plan
      (``_ngram_pair_counts_shuffle``) — the 100 TB shape;
    * a c=1 pair can only reach ``jaccard >= t`` when
      n_a + n_b <= 1 + 1/t (jaccard = c/(n_a+n_b-c)), so the stream
      is cut to ``c >= 2 OR both docs tiny`` right after the count,
      fused into the aggregation stage (the 1e-4 slack keeps the
      pre-filter a strict superset of the round-to-4-digits filter).
    """
    import os

    if broadcast_index_rows is None:
        # interpreted as a DOC-count gate: the exact index row count
        # would cost the very shingle pass the broadcast plan avoids
        # paying twice. ~100k docs x ~50 distinct shingles x 16 bytes
        # is already at the ceiling of a sane broadcast.
        broadcast_index_rows = int(
            os.environ.get("SPARK_GRAFT_NGRAM_BCAST_DOCS", str(100_000))
        )
    # packed-key validity: id bounds from one id-column-only aggregate
    # (column-pruned scan, no shingle work); the shingle-count bound
    # is enforced in-plan by the assert in _ngram_shingle_rows.
    n_docs, id_lo, id_hi = df.agg(
        F.count(F.lit(1)), F.min(id_col), F.max(id_col)
    ).collect()[0]
    if not (
        n_docs == 0
        or (0 <= id_lo and id_hi < (1 << (62 - _NGRAM_N_BITS)))
    ):
        # ids outside the packable range: rebuild unpacked — (id, n)
        # as two columns, the classic shuffle-count plan.
        return _ngram_jaccard_pairs_unpacked(
            df, text_col, id_col, k, threshold, max_df
        )
    sh = _ngram_shingle_rows(df, text_col, id_col, k, max_df).select("pk", "h")
    # SPARK_GRAFT_NGRAM_IMPL=kernel selects the numpy posting-list
    # kernel (_ngram_pair_counts_kernel) — correct and fully tested,
    # but NOT the default: on this sandbox VM the index collect and
    # the per-worker broadcast pay first-touch page faults at
    # ~6 MB/s/thread (measured 17 s toPandas for a 42 MB index), which
    # the pre-touched JVM heap of the broadcast plan never pays. On
    # hardware with normally-backed memory the kernel is the likely
    # winner for the probe+aggregate stage.
    impl = os.environ.get("SPARK_GRAFT_NGRAM_IMPL", "broadcast")
    if n_docs <= broadcast_index_rows and impl == "kernel":
        counts = _ngram_pair_counts_kernel(sh, threshold)
    elif n_docs <= broadcast_index_rows:
        counts = _ngram_pair_counts_broadcast(sh)
    else:
        counts = _ngram_pair_counts_shuffle(sh)
    c1_sum_bound = 1.0 + 1.0 / max(threshold - 1e-4, 1e-9)
    n_mask = (1 << _NGRAM_N_BITS) - 1
    n_a = F.col("pk_a").bitwiseAND(F.lit(n_mask))
    n_b = F.col("pk_b").bitwiseAND(F.lit(n_mask))
    return (
        counts.filter(
            (F.col("c") >= 2) | (n_a + n_b <= F.lit(c1_sum_bound))
        )
        .select(
            F.shiftrightunsigned("pk_a", _NGRAM_N_BITS).alias("id_a"),
            F.shiftrightunsigned("pk_b", _NGRAM_N_BITS).alias("id_b"),
            F.round(F.col("c") / (n_a + n_b - F.col("c")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _ngram_jaccard_pairs_unpacked(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    threshold: float,
    max_df: int | None,
) -> DataFrame:
    """Fallback for id/count domains that do not fit the packed key:
    identical algorithm with (id, n) as separate columns and the
    shuffle-count plan (negative/huge ids are rare enough that this
    path does not need the broadcast variant)."""
    base = spread(df, id_col).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k).alias("_sh"),
    )
    sh = base.select(
        "_id", F.size("_sh").alias("n"), F.explode("_sh").alias("_s")
    ).select("_id", "n", F.xxhash64("_s").alias("h"))
    if max_df is not None:
        sh = _cap_buckets(sh, ["h"], max_df)
    sh = spread(sh, "h", force=True, factor=4)
    a, b = sh.alias("a"), sh.alias("b")
    counts = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("a.n").alias("n_a"),
            F.col("b._id").alias("id_b"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c1_sum_bound = 1.0 + 1.0 / max(threshold - 1e-4, 1e-9)
    return (
        counts.filter(
            (F.col("c") >= 2)
            | (F.col("n_a") + F.col("n_b") <= F.lit(c1_sum_bound))
        )
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- simhash


def _simhash_kernel_fn(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word unigrams, batch-vectorized: the whole
    Arrow batch's words are flattened into ONE ``pd.util.hash_array``
    call (vectorized SipHash, deterministic with the fixed default
    key), and per-document bit votes come from ``np.add.reduceat``
    over the per-doc segments — no per-document Python loop, no
    per-document allocations."""
    import itertools

    import numpy as np

    split = texts.fillna("").str.split()
    counts = split.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    out = np.zeros(len(texts), dtype=np.int64)
    if total == 0:
        return pd.Series(out)
    flat = np.fromiter(
        itertools.chain.from_iterable(split), dtype=object, count=total
    )
    hs = pd.util.hash_array(flat)  # one vectorized hash over the batch

    ne = counts > 0  # reduceat segments must be non-empty
    counts_ne = counts[ne]
    offsets = np.zeros(len(counts_ne), dtype=np.int64)
    np.cumsum(counts_ne[:-1], out=offsets[1:])
    # 64 single-pass reduceats (one per bit) keep peak memory at one
    # flat int64 array instead of a (words x 64) matrix.
    packed = np.zeros(len(counts_ne), dtype=np.uint64)
    for b in range(64):
        ones = np.add.reduceat(((hs >> np.uint64(b)) & np.uint64(1)).astype(np.int64), offsets)
        votes = 2 * ones - counts_ne  # (+1 per set bit, -1 per clear)
        packed |= (votes > 0).astype(np.uint64) << np.uint64(b)
    out[ne] = packed.view(np.int64)  # two's-complement reinterpret
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str) -> DataFrame:
    kernel = F.pandas_udf(_simhash_kernel_fn, "long")
    return df.withColumn("simhash", kernel(F.col(text_col)))


def hamming_blocks(n_bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) block decomposition for the pigeonhole candidate
    trick: with ``max_hamming + 1`` disjoint blocks covering all
    ``n_bits``, any pair within Hamming ``max_hamming`` has at least
    one block where NO differing bit landed — i.e. an exact block
    match. Fewer blocks than ``max_hamming + 1`` silently lose recall
    for distances >= n_blocks (the round-1 bug: 4 blocks with
    max_hamming=8 dropped pairs whose 4-8 diffs spanned all blocks)."""
    n_blocks = max_hamming + 1
    assert n_blocks <= n_bits, "radius too large for the hash width"
    base, extra = divmod(n_bits, n_blocks)
    blocks, shift = [], 0
    for b in range(n_blocks):
        width = base + (1 if b < extra else 0)
        blocks.append((shift, width))
        shift += width
    return blocks


def _cap_buckets(keyed: DataFrame, key_cols: list[str], max_bucket: int | None) -> DataFrame:
    """Drop bucket keys shared by more than ``max_bucket`` rows before
    a bucket self-join: a degenerate bucket of k near-identical docs
    otherwise emits O(k²) candidate pairs. Mega-cluster members are
    still found by exact dedup / the other blocks; this bounds the
    worst-case join output at scale."""
    if max_bucket is None:
        return keyed
    sizes = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )
    return keyed.join(sizes, key_cols)


def near_pairs_from_sig(
    sigs: DataFrame,
    id_col: str = "_id",
    sig_col: str = "sig",
    n_bits: int = 64,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    broadcast_rows: int | None = None,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(sig) <= max_hamming
    over any integer signature column, via the pigeonhole block join —
    candidates from equi-joins on block values, never O(n²).

    Both join sides are the SAME exchanged subtree, so the expensive
    signature computation runs once on either plan (ReusedExchange).
    When ``n_rows_hint`` (a cheap caller-side row count — do NOT count
    the signature frame itself, that would recompute it) says the
    block index fits a broadcast (``broadcast_rows`` gate, default
    SPARK_GRAFT_PAIR_BCAST_ROWS), the probe side is hash-partitioned
    by ``_id``, so every (a, b) pair materializes in exactly a's
    partition and the cross-block ``distinct`` needs NO exchange
    (measured at sf1.0: the block join emitted 10.4M surviving pairs
    that all shuffled for the distinct); without a hint, or above the
    gate, the classic both-sides-exchanged join remains — the 100 TB
    shape."""
    import os

    if broadcast_rows is None:
        broadcast_rows = int(
            os.environ.get("SPARK_GRAFT_PAIR_BCAST_ROWS", str(4_000_000))
        )
    s = sigs.select(F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"))
    blks = hamming_blocks(n_bits, max_hamming)
    blocks = s.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("_sig"), shift)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for b, (shift, width) in enumerate(blks)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_sig", "_b.blk", "_b.bv")
    blocks = _cap_buckets(blocks, ["blk", "bv"], max_bucket)
    n_blocks = len(blks)
    if n_rows_hint is not None and n_rows_hint * n_blocks <= broadcast_rows:
        # broadcast-probe: pairs for a given id_a are confined to
        # id_a's partition, so filter-then-distinct completes in the
        # probe stage with no pair exchange; the broadcast build reads
        # the probe's shuffle output (ReusedExchange)
        p = sigs.sparkSession.sparkContext.defaultParallelism
        blocks = blocks.repartition(p, "_id")
        l = blocks.alias("l")
        r = F.broadcast(blocks).alias("r")
    else:
        # pin the block self-join's exchange (compute fan-out vs tiny
        # bytes, which AQE's byte-based coalescing under-parallelizes)
        blocks = spread(blocks, "blk", "bv", force=True)
        l, r = blocks.alias("l"), blocks.alias("r")
    # The Hamming filter runs BEFORE the cross-block distinct (guide
    # §2.3: filter before the exchange): block joins admit orders of
    # magnitude more false candidates than true pairs, and bit_count
    # on the two signatures already in hand is a codegen'd map-side
    # filter — the distinct then deduplicates only true pairs.
    # hamming is a function of (id_a, id_b), so filter-then-distinct
    # returns exactly the old distinct-then-filter row set.
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.bit_count(F.col("l._sig").bitwiseXOR(F.col("r._sig")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by
    the pigeonhole block trick (see ``hamming_blocks``): candidates
    come from equi-joins on block values, never O(n²). The block count
    is derived from the radius, so recall is exact (every true pair is
    a candidate). ``max_bucket`` bounds degenerate buckets."""
    s = simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    # cheap row-count hint (column-pruned count over the INPUT, not
    # the signature frame) gates the broadcast-probe plan
    return near_pairs_from_sig(
        s, "_id", "simhash", 64, max_hamming, max_bucket,
        n_rows_hint=df.count(),
    )


def simhash_md5(
    df: DataFrame, text_col: str, id_col: str, n_bits: int = 60
) -> DataFrame:
    """Cross-engine SimHash variant: word hashes are the first
    ``n_bits/4`` hex digits of md5(word) — reproducible in any engine
    with md5 (the DuckDB oracle recomputes it digit-by-digit) — and
    the whole computation is JVM columnar (explode words → md5 →
    per-bit vote sums), zero Python. The production kernel
    (``simhash``) uses vectorized SipHash instead; same algorithm,
    different word-hash family. Returns (id, sig)."""
    assert n_bits % 4 == 0 and n_bits <= 60  # sums of (1 << b) stay in long
    ndig = n_bits // 4
    words = F.split(F.col(text_col), " ")
    ex = spread(df, id_col).select(
        F.col(id_col).alias("_id"), F.explode(words).alias("w")
    )
    hx = ex.select("_id", F.md5("w").alias("hx"))
    # digit values once (codegen-friendly ints)
    dv = hx.select(
        "_id",
        *[
            F.conv(F.substring("hx", i + 1, 1), 16, 10)
            .cast("long")
            .alias(f"d{i}")
            for i in range(ndig)
        ],
    )
    # One packed aggregate per digit instead of 4 per bit: the digit's
    # 4 bit-indicators spread into 16-bit lanes of a long, so ONE sum
    # accumulates 4 bit-counts (safe to 65k words/doc) — 15 agg
    # buffers instead of 60 (measured ~2x on the whole query).
    def lane_spread(d):
        return (
            d.bitwiseAND(F.lit(1))
            + F.shiftleft(F.shiftright(d, 1).bitwiseAND(F.lit(1)), 16)
            + F.shiftleft(F.shiftright(d, 2).bitwiseAND(F.lit(1)), 32)
            + F.shiftleft(F.shiftright(d, 3).bitwiseAND(F.lit(1)), 48)
        )

    votes = dv.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(lane_spread(F.col(f"d{i}"))).alias(f"s{i}") for i in range(ndig)],
    )
    # Runtime guard on the lane capacity: a doc with > 65535 words
    # would carry a full lane into its neighbour and silently corrupt
    # the signature (and diverge from the oracle, which has no such
    # cap) — fail loudly instead. assert_true yields NULL on success,
    # so coalesce(…, 0) folds it into the signature sum, which keeps
    # the check in the plan (a free-standing unselected column would
    # be pruned by Catalyst). Per-doc cost, negligible.
    lane_guard = F.coalesce(
        F.assert_true(
            F.col("_n") <= F.lit(65535),
            F.concat(
                F.lit("simhash_md5: document "),
                F.col("_id"),
                F.lit(" has > 65535 words; 16-bit vote lanes would overflow"),
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    # bit b set iff votes_b > 0 iff 2*ones_b > n_words
    sig = None
    for b in range(n_bits):
        ones = F.shiftright(F.col(f"s{b // 4}"), 16 * (b % 4)).bitwiseAND(
            F.lit(0xFFFF)
        )
        term = F.when(2 * ones > F.col("_n"), F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return votes.select("_id", (sig + lane_guard).alias("sig"))
