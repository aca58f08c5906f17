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
    """Distinct word k-gram shingles of a text column (JVM HOFs only)."""
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
    h_i(x) = hash(x, i) family."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles_col, lambda s, i=i: F.xxhash64(F.lit(i), s))
            )
            for i in range(n_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows/band r = n_hashes/bands; two docs collide in a band iff that
    r-slice of their signatures is identical — P(collide) = s^r for
    Jaccard s, the classic S-curve. Output: (id_a, id_b) candidate
    pairs (id_a < id_b), deduped across bands.
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(word_shingles(F.col(text_col), shingle_k), n_hashes).alias(
            "_sig"
        ),
    )
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
                                F.transform(
                                    F.slice("_sig", b * r + 1, r),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_b.band", "_b.bh")
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


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold via an inverted
    index: explode distinct shingles, self-join on shingle, count
    co-occurrences, then |A∩B| / (|A|+|B|-|A∩B|).

    The self-join key is the shingle — at scale, drop ultra-frequent
    shingles first (df-cut) to bound bucket sizes; here the filter
    seam is ``max_df`` (disabled by default to keep oracle parity).
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("s"),
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- simhash


def _simhash_kernel_fn(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word unigrams. Per Arrow batch: word hashes
    via pandas' vectorized SipHash (``pd.util.hash_array``,
    deterministic with the fixed default key), bit votes as one numpy
    matrix op per document."""
    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        words = text.split()
        if not words:
            continue
        hs = pd.util.hash_array(np.asarray(words, dtype=object))
        bits = ((hs[:, None] >> shifts) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sim = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        out[row] = sim - (1 << 64) if sim >= (1 << 63) else sim
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str) -> DataFrame:
    kernel = F.pandas_udf(_simhash_kernel_fn, "long")
    return df.withColumn("simhash", kernel(F.col(text_col)))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by
    the 4-block trick: split 64 bits into 4 blocks of 16; any pair
    within Hamming 3 shares at least one exact block (pigeonhole), so
    candidates come from equi-joins on block values, never O(n²)."""
    s = simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    blocks = s.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_b"),
    ).select("_id", "simhash", "_b.blk", "_b.bv")
    l, r = blocks.alias("l"), blocks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
