"""Bloom-filter incremental dedup: admit a NEW batch of documents
against a huge historical corpus without joining the whole batch
against all of history.

The reference dedups by identity against its checkpoint store on
every (re)scan (`src/watcher/discovery.rs:33-35,71-73`); this is the
same admit-only-unseen semantic at corpus scale. The history side is
scanned exactly TWICE — once to build a compact bloom bitmap
(per-partition numpy bitmaps OR-reduced on the driver, a few hundred
KB of metadata, like a broadcast join's build side), once streamed
map-side through the exact-verify join — plus one extra sizing
``count()`` pass only when the caller does not supply
``expected_keys`` (steady-state ingest knows last epoch's corpus
count from its own checkpoint metrics and should pass it). Then:

* the new batch is filtered map-side by bloom probes (an
  Arrow-vectorized pandas UDF; candidates = true dups + the
  false-positive fraction epsilon of the batch);
* only that tiny candidate set is exactly verified against history,
  as an inner join with the CANDIDATES broadcast, so the verify pass
  streams the history scan map-side — no big-side shuffle anywhere;
* kept = new anti-join the verified dup-id set (broadcast again).

Output is EXACT: bloom false positives are eliminated by the verify
join and false negatives are impossible, so the result equals a plain
anti-join on content and a SQL oracle checks the whole approximate
structure end-to-end. (Spark's own runtime bloom join —
``spark.sql.optimizer.runtime.bloomFilter.enabled`` — injects the
same shape automatically for selective equi-joins; this operator is
the explicit, reusable-bitmap variant: the history bloom can be built
once per ingest epoch and reused across many new batches, which the
runtime filter cannot do.)

Probes use Kirsch-Mitzenmacher double hashing off one JVM-side
xxhash64: position_i = (h_lo + i * (h_hi | 1)) mod m — build and
probe derive identical positions from the same 64-bit key hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _positions(h64: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    """i-th probe position for each 64-bit hash (uint64 view math)."""
    h = h64.view(np.uint64) if h64.dtype != np.uint64 else h64
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    return (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def build_bloom_bitmap(
    hashes: DataFrame, m_bits: int, n_hashes: int, h_col: str = "h"
) -> np.ndarray:
    """Distributed bloom build: each partition sets its keys' bits in
    a local numpy bitmap (one ``mapInPandas`` pass, one m_bits/8-byte
    row per partition), the driver ORs the partials. m_bits must be a
    multiple of 64."""
    m_words = m_bits // 64

    def part(batches):
        bm = np.zeros(m_words, dtype=np.uint64)
        got = False
        for pdf in batches:
            if pdf.empty:
                continue
            got = True
            h = pdf[h_col].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(n_hashes):
                pos = _positions(h, i, m_bits)
                w = (pos >> np.uint64(6)).astype(np.int64)
                b = pos & np.uint64(63)
                np.bitwise_or.at(bm, w, np.uint64(1) << b)
        if got:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    out = np.zeros(m_words, dtype=np.uint64)
    for row in hashes.mapInPandas(part, "bitmap binary").collect():
        out |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    return out


def _might_contain_udf(bloom: np.ndarray, m_bits: int, n_hashes: int):
    """Arrow-vectorized membership probe; the bitmap ships to
    executors inside the serialized UDF closure (broadcast-sized)."""

    @pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        hv = h.to_numpy(dtype=np.int64).view(np.uint64)
        res = np.ones(len(hv), dtype=bool)
        for i in range(n_hashes):
            pos = _positions(hv, i, m_bits)
            w = (pos >> np.uint64(6)).astype(np.int64)
            b = pos & np.uint64(63)
            res &= ((bloom[w] >> b) & np.uint64(1)).astype(bool)
        return pd.Series(res)

    return probe


def dedup_against_history(
    new_df: DataFrame,
    hist_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits_per_key: int = 16,
    n_hashes: int = 7,
    expected_keys: int | None = None,
) -> DataFrame:
    """Rows of ``new_df`` whose ``text_col`` content does NOT appear
    in ``hist_df`` — exact anti-join semantics at bloom cost. The
    bitmap is sized to ``expected_keys`` when given (any upper bound
    on the history count works — last epoch's checkpointed corpus
    count is the natural source; oversizing only costs bitmap bytes,
    undersizing only raises the false-positive verify load, never
    correctness). Without it, one dedicated ``count()`` scan of
    history sizes the bitmap (16 bits/key, 7 probes → ~epsilon 4e-4
    false-positive candidates to verify)."""
    if expected_keys is not None and expected_keys < 1:
        raise ValueError(
            f"expected_keys must be >= 1, got {expected_keys} — a zero/"
            "negative sizing hint (e.g. an empty first-epoch checkpoint "
            "metric) would collapse the bitmap and turn the 'tiny "
            "candidate set' into the whole batch; pass None to count"
        )
    h_hist = hist_df.select(F.xxhash64(F.col(text_col)).alias("h"))
    n = expected_keys if expected_keys is not None else h_hist.count()
    m_bits = 1 << max(14, int(max(n, 1) * bits_per_key - 1).bit_length())
    bloom = build_bloom_bitmap(h_hist, m_bits, n_hashes)
    probe = _might_contain_udf(bloom, m_bits, n_hashes)

    withh = new_df.withColumn("_h", F.xxhash64(F.col(text_col)))
    cand = withh.filter(probe(F.col("_h"))).select(
        F.col(id_col).alias("_cid"), "_h", F.col(text_col).alias("_ct")
    )
    hist_kv = hist_df.select(
        F.xxhash64(F.col(text_col)).alias("_h"), F.col(text_col).alias("_ht")
    )
    # exact verify: history streams map-side against the broadcast
    # candidate set (hash AND content equality — collision honesty)
    dup_ids = (
        hist_kv.join(
            F.broadcast(cand),
            (hist_kv["_h"] == cand["_h"]) & (hist_kv["_ht"] == cand["_ct"]),
            "inner",
        )
        .select(F.col("_cid").alias(id_col))
        .distinct()
    )
    return withh.join(F.broadcast(dup_ids), id_col, "left_anti").drop("_h")
