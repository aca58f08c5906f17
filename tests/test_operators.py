"""Invariant tests for operators whose oracle is not SQL-expressible:
MinHash/SimHash near-dup recall on planted duplicates, ANN recall vs
the brute-force baseline, multimodal plumbing."""

import os

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )


def _mutate_drop_last_word(df, every=5):
    return df.filter(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')"
        ).alias("text"),
    )


def test_minhash_finds_planted_near_dups(spark, docs):
    from ves_spark.operators.dedup import minhash_dedup_pairs

    base = docs.filter(F.size(F.split("text", " ")) >= 20)
    planted = base.unionAll(_mutate_drop_last_word(base))
    pairs = minhash_dedup_pairs(
        planted, "text", "doc_id", threshold=0.8, n_hashes=32, bands=16
    ).toPandas()
    expected = {
        (int(r["doc_id"]), int(r["doc_id"]) + 1_000_000)
        for r in base.filter(F.col("doc_id") % 5 == 0).select("doc_id").collect()
    }
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    recall = len(expected & found) / len(expected)
    # dropping 1 word of >=20 keeps shingle-jaccard ~0.9; 16 bands of
    # r=2 catch s=0.9 pairs w.p. 1-(1-s^2)^16 ≈ 1-3e-12 each
    assert recall >= 0.9, f"minhash recall {recall}"
    # soundness: every reported pair really meets the threshold
    assert (pairs["jaccard"] >= 0.8).all()


def test_simhash_hamming_small_for_near_dups(spark, docs):
    from ves_spark.operators.dedup import simhash

    base = docs.filter(F.size(F.split("text", " ")) >= 30)
    planted = base.unionAll(_mutate_drop_last_word(base, every=1))
    h = simhash(planted, "text").toPandas().set_index("doc_id")["simhash"]
    import numpy as np

    hams = []
    for did in h.index:
        if did >= 1_000_000 and (did - 1_000_000) in h.index:
            x = (int(h[did]) & 0xFFFFFFFFFFFFFFFF) ^ (
                int(h[did - 1_000_000]) & 0xFFFFFFFFFFFFFFFF
            )
            hams.append(bin(x).count("1"))
    assert hams, "no planted pairs"
    assert sum(hams) / len(hams) <= 8, f"mean hamming {sum(hams)/len(hams)}"


def test_simhash_deterministic(spark, docs):
    from ves_spark.operators.dedup import simhash

    a = simhash(docs, "text").toPandas().sort_values("doc_id")["simhash"].tolist()
    b = simhash(docs, "text").toPandas().sort_values("doc_id")["simhash"].tolist()
    assert a == b


def test_ann_lsh_recall_vs_bruteforce(spark):
    from ves_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    exact = cosine_topk_bruteforce(q, c, k=5).toPandas()
    approx = cosine_topk_lsh(q, c, k=5, n_planes=3, n_tables=12, dim=64).toPandas()
    e_pairs = set(zip(exact["q_id"], exact["c_id"]))
    a_pairs = set(zip(approx["q_id"], approx["c_id"]))
    recall = len(e_pairs & a_pairs) / len(e_pairs)
    # 8 buckets over clustered embeddings: same-cluster neighbors
    # mostly share sign bits; this is a smoke floor, not a guarantee
    assert recall >= 0.6, f"ANN recall {recall}"
    # the approximate scores it does return are the true cosines
    merged = approx.merge(exact, on=["q_id", "c_id"], suffixes=("_a", "_e"))
    assert (abs(merged["cos_a"] - merged["cos_e"]) < 1e-9).all()


def test_multimodal_plumbing(spark):
    from ves_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        make_fake_media,
    )

    media = make_fake_media(spark, n=48)
    feats = extract_features(media, decode_mode="fake").toPandas()
    assert len(feats) == 48
    assert (feats["n_bytes"] > 0).all()
    assert feats["feat"].map(len).eq(8).all()
    # histogram features are normalized: sum ≈ 1
    import numpy as np

    assert np.allclose([sum(f) for f in feats["feat"]], 1.0, atol=1e-3)

    frames = frame_sample_plan(media, every_n=10).toPandas()
    vids = media.filter(F.col("kind") == "video").count()
    assert frames["media_id"].nunique() == vids
    assert (frames["frame_idx"] % 10 == 0).all()


def test_multimodal_real_decode_is_stubbed(spark):
    from ves_spark.operators.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG")


def test_fingerprint_xxhash_variant(spark, docs):
    """Order sensitivity: permuting words changes the fingerprint."""
    from ves_spark.operators.text import fingerprint

    fp = docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        fingerprint(
            F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")
        ).alias("fp_rev"),
    ).toPandas()
    multi_word = fp  # docs have >=2 distinct words almost surely
    changed = (multi_word["fp"] != multi_word["fp_rev"]).mean()
    assert changed > 0.95
    assert (fp["fp"] >= 0).all() and (fp["fp"] < 1_000_000_007).all()


def test_simhash_kernel_matches_rowwise_reference(spark, docs):
    """The batch-vectorized kernel (flatten + one hash_array +
    reduceat) must equal a straightforward per-row reference."""
    import numpy as np
    import pandas as pd

    from ves_spark.operators.dedup import _simhash_kernel_fn

    texts = docs.limit(200).toPandas()["text"]
    texts = pd.concat([texts, pd.Series(["", "one", "a b a b"])], ignore_index=True)

    def rowwise(text):
        words = text.split()
        if not words:
            return 0
        hs = pd.util.hash_array(np.asarray(words, dtype=object))
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((hs[:, None] >> shifts) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sim = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        return sim - (1 << 64) if sim >= (1 << 63) else sim

    got = _simhash_kernel_fn(texts).tolist()
    want = [rowwise(t) for t in texts]
    assert got == want


def test_simhash_near_pairs_complete_at_radius(spark, docs):
    """Pigeonhole completeness: with blocks derived from the radius,
    every pair within Hamming <= max_hamming is found — cross-checked
    against brute-force hamming over the signatures (round-1 bug: 4
    fixed blocks silently dropped distances 4-8)."""
    from ves_spark.operators.dedup import simhash, simhash_near_pairs

    base = docs.filter(F.size(F.split("text", " ")) >= 20).limit(150)
    planted = base.unionAll(_mutate_drop_last_word(base, every=1))
    found = simhash_near_pairs(planted, "text", "doc_id", max_hamming=8).toPandas()
    sigs = simhash(planted, "text").toPandas()

    import itertools

    expect = set()
    rows = list(zip(sigs["doc_id"], sigs["simhash"]))
    for (ida, ha), (idb, hb) in itertools.combinations(rows, 2):
        x = (int(ha) & (2**64 - 1)) ^ (int(hb) & (2**64 - 1))
        if bin(x).count("1") <= 8:
            expect.add((min(ida, idb), max(ida, idb)))
    got = set(zip(found["id_a"], found["id_b"]))
    assert got == expect
    assert (found["hamming"] <= 8).all()


def test_bucket_caps_bound_degenerate_clusters(spark):
    """1k identical docs: uncapped LSH would emit ~500k candidate
    pairs per band; the bucket cap bounds the join output while leaving
    normal-sized buckets untouched."""
    from ves_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )

    n = 1000
    rows = [(i, "the same degenerate document body repeated verbatim") for i in range(n)]
    rows += [(n + i, f"unique filler document number {i} with words {i * 7} and {i * 13}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_candidates(df, "text", "doc_id", max_bucket=32)
    assert capped.count() <= 32 * 31 // 2 * 8  # per-band cap bound

    sim_capped = simhash_near_pairs(df, "text", "doc_id", max_hamming=3, max_bucket=32)
    assert sim_capped.count() <= 32 * 31 // 2 * 4

    jac = ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.9, max_df=32)
    # the degenerate cluster's stop-shingles are cut: no O(k^2) blowup
    assert jac.count() <= 32 * 31 // 2 + 50


def test_ann_matmul_bucket_impl_recall(spark):
    """The production (BLAS matmul) bucket assigner must be
    recall-equivalent to the deterministic fold spec."""
    from ves_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    exact = cosine_topk_bruteforce(q, c, k=5).toPandas()
    fast = cosine_topk_lsh(
        q, c, k=5, n_planes=3, n_tables=12, dim=64, bucket_impl="matmul"
    ).toPandas()
    e_pairs = set(zip(exact["q_id"], exact["c_id"]))
    f_pairs = set(zip(fast["q_id"], fast["c_id"]))
    assert len(e_pairs & f_pairs) / len(e_pairs) >= 0.6
    merged = fast.merge(exact, on=["q_id", "c_id"], suffixes=("_a", "_e"))
    assert (abs(merged["cos_a"] - merged["cos_e"]) < 1e-9).all()


def test_simhash_md5_lane_overflow_guard(spark):
    """simhash_md5 packs 4 bit-vote counters into 16-bit lanes of one
    long; a doc with > 65535 words would overflow a lane and corrupt
    the signature silently. The runtime guard must raise instead."""
    from pyspark.errors import ArithmeticException
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from ves_spark.operators.dedup import simhash_md5

    ok = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    assert simhash_md5(ok, "text", "doc_id").count() == 1

    # 'w2058': every one of md5's first 15 hex digits < 8, so the
    # 2^48 lane stays empty and the long sum does NOT overflow — the
    # silent-carry region only the explicit _n guard can catch.
    big = spark.createDataFrame(
        [("d2", " ".join(["w2058"] * 65_600))], "doc_id string, text string"
    )
    with pytest.raises(SparkRuntimeException, match="65535 words"):
        simhash_md5(big, "text", "doc_id").collect()

    # words with high digit bits: the per-lane packed sum itself
    # overflows long first — ANSI mode makes that loud too.
    big2 = spark.createDataFrame(
        [("d3", " ".join(["w"] * 65_600))], "doc_id string, text string"
    )
    with pytest.raises((SparkRuntimeException, ArithmeticException)):
        simhash_md5(big2, "text", "doc_id").collect()


def test_multimodal_vectorized_equals_rowwise(spark):
    """The batch-vectorized checksum/histogram math must equal a plain
    row-at-a-time reference, including zero-length payloads."""
    import numpy as np

    from ves_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        make_fake_media,
    )

    media = make_fake_media(spark, n=32)
    empty = spark.createDataFrame(
        [("m-empty", "image", b"", (None, None, None, None))], MEDIA_SCHEMA
    )
    got = (
        extract_features(media.unionAll(empty), decode_mode="fake")
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )

    rows = media.unionAll(empty).collect()
    for r in rows:
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        want_ck = int(arr.astype(np.int64).sum() % 1_000_000_007) if arr.size else 0
        want_hist = (
            np.bincount(arr >> 5, minlength=8).astype(np.float32) / max(arr.size, 1)
        )
        g = got.loc[r["media_id"]]
        assert int(g["checksum"]) == want_ck, r["media_id"]
        assert np.allclose(np.array(g["feat"]), want_hist, atol=1e-6), r["media_id"]
        assert int(g["n_bytes"]) == arr.size


def test_multimodal_injected_decode_fn(spark):
    """decode_mode='real' with an injected toy codec: per-item decode,
    then the shared vectorized feature math over the DECODED bytes."""
    import numpy as np

    from ves_spark.operators.multimodal import extract_features, make_fake_media

    media = make_fake_media(spark, n=12)
    # toy codec: bitwise NOT of the payload
    toy = lambda b: bytes(255 - x for x in b)  # noqa: E731
    got = (
        extract_features(media, decode_mode="real", decode_fn=toy)
        .toPandas()
        .set_index("media_id")
    )
    for r in media.collect():
        raw = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        dec = (255 - raw).astype(np.uint8)
        g = got.loc[r["media_id"]]
        # n_bytes reports the INPUT payload size; checksum/hist the decoded bytes
        assert int(g["n_bytes"]) == raw.size
        assert int(g["checksum"]) == int(dec.astype(np.int64).sum() % 1_000_000_007)
        want = np.bincount(dec >> 5, minlength=8).astype(np.float32) / max(dec.size, 1)
        assert np.allclose(np.array(g["feat"]), want, atol=1e-6)


def test_multimodal_real_without_codec_still_raises(spark):
    from ves_spark.operators.multimodal import extract_features, make_fake_media

    media = make_fake_media(spark, n=3)
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        extract_features(media, decode_mode="real").collect()


def test_ann_ivf_recall_vs_bruteforce(spark):
    from ves_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    exact = cosine_topk_bruteforce(q, c, k=5).toPandas()
    e_pairs = set(zip(exact["q_id"], exact["c_id"]))

    def recall(train_iters):
        approx = cosine_topk_ivf(
            q, c, k=5, n_cents=32, train_iters=train_iters, n_probe=8
        ).toPandas()
        a_pairs = set(zip(approx["q_id"], approx["c_id"]))
        return len(e_pairs & a_pairs) / len(e_pairs), approx

    # trained cells must beat the untrained seeded init at EQUAL cell
    # and probe counts — the point of running Lloyd at all (measured
    # here: 0.55 untrained -> 0.68 after 2 iterations)
    r0, _ = recall(0)
    r2, approx = recall(2)
    assert r2 >= 0.6, f"IVF recall {r2}"
    assert r2 > r0, f"training didn't help: {r0} -> {r2}"
    # the approximate scores it does return are the true cosines
    merged = approx.merge(exact, on=["q_id", "c_id"], suffixes=("_a", "_e"))
    assert (abs(merged["cos_a"] - merged["cos_e"]) < 1e-9).all()


def test_repetition_features_planted(spark):
    from ves_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),    # 7 trigrams, 3 distinct
            (2, "one two three four"),   # 2 trigrams, both unique
            (3, "xy zz"),                # < 3 words -> 0 ngrams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_distinct"], r["rep_ratio"])
        for r in repetition_features(df, "text", n=3).collect()
    }
    assert got[1] == (7, 3, round(1 - 3 / 7, 4))
    assert got[2] == (2, 2, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_contaminated_docs_planted(spark):
    from ves_spark.operators.text import contaminated_docs

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the 5-gram "quick brown fox jumps over"
            (1, "he said the quick brown fox jumps over everything"),
            # shares words but no 5-gram
            (2, "quick brown dog sleeps all day long here now"),
            # exact copy: every benchmark 5-gram hits
            (3, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hit_ngrams"], r["n_bench_docs"])
        for r in contaminated_docs(docs, bench, n=5).collect()
    }
    assert set(got) == {1, 3}
    assert got[1] == (2, 1)  # "the quick..over" and "quick..over everything"? no:
    # doc 1 grams overlapping bench: "the quick brown fox jumps",
    # "quick brown fox jumps over" -> 2 hits
    assert got[3] == (5, 1)  # a 9-word doc has 5 distinct 5-grams, all hit


def test_connected_components_chain_and_merge(spark):
    from ves_spark.operators.components import (
        connected_components,
        dedup_keepers,
    )

    # chain 1-2-3-4 (diameter 3), pair {10,11}, bridge merging {20,21}
    # and {22,23} via (21,22), singleton 99 not in any edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (22, 23), (21, 22)],
        "id_a long, id_b long",
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20, 23: 20}

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long"
    )
    keep = {
        r["doc_id"]: r["keeper"]
        for r in dedup_keepers(docs, connected_components(edges)).collect()
    }
    # one keeper per component; isolated docs keep themselves
    assert keep == {1: True, 2: False, 3: False, 4: False,
                    10: True, 11: False, 99: True}


def test_connected_components_adversarial_chain_logarithmic(spark):
    """A 2,000-node path graph (diameter 1,999) must close in <= 15
    alternating large-star/small-star rounds — hash-min label
    propagation would need ~2,000. max_iter doubles as the round
    budget: finishing under max_iter=15 proves the bound, and the
    operator must RAISE (never return wrong labels) when the budget
    is genuinely too small."""
    import pytest

    from ves_spark.operators.components import connected_components

    n = 2000
    edges = spark.range(1, n).selectExpr("id AS id_a", "id + 1 AS id_b")

    comp = connected_components(edges, max_iter=15)
    rows = comp.collect()
    assert len(rows) == n
    assert all(r["component"] == 1 for r in rows)
    assert sorted(r["node"] for r in rows) == list(range(1, n + 1))

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_pack_chunks_spanning_and_offsets(spark):
    from ves_spark.operators.packing import pack_chunks

    df = spark.createDataFrame(
        [("s", 1, 100), ("s", 2, 100), ("s", 3, 100), ("t", 9, 600)],
        "source string, doc_id long, n long",
    )
    got = {
        r["doc_id"]: (r["tok_start"], r["chunk_start"], r["chunk_end"], r["start_off"])
        for r in pack_chunks(df, 256, F.col("n"), "source", "doc_id").collect()
    }
    # stream s: docs at 0, 100, 200; doc 2 fits chunk 0, doc 3 SPANS 0->1
    assert got[1] == (0, 0, 0, 0)
    assert got[2] == (100, 0, 0, 100)
    assert got[3] == (200, 0, 1, 200)
    # stream t is independent; a 600-tok doc spans chunks 0..2
    assert got[9] == (0, 0, 2, 0)


def test_pack_chunks_sharded_skewed_source(spark):
    """One source holding 90% of all tokens: the decomposed scan must
    reproduce the sequential layout bit-for-bit, split the hot source
    into multiple budget-bounded shards, and run its prefix windows
    per (source, block) — not one task per source."""
    import pytest

    from ves_spark.operators.packing import pack_chunks, pack_chunks_sharded

    # hot source: 900 docs x 100 tok = 90k; cold: 100 docs x 100 = 10k
    rows = [("hot", f"h{i:04d}", 100) for i in range(900)]
    rows += [("cold", f"c{i:04d}", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n long")

    budget = 8_192
    sharded = pack_chunks_sharded(df, 256, F.col("n"), budget, "source", "doc_id")
    seq = pack_chunks(df, 256, F.col("n"), "source", "doc_id")

    cols = ["tok_start", "chunk_start", "chunk_end", "start_off"]
    got = {r["doc_id"]: tuple(r[c] for c in cols) for r in sharded.collect()}
    exp = {r["doc_id"]: tuple(r[c] for c in cols) for r in seq.collect()}
    assert got == exp, "decomposed scan diverged from sequential layout"

    # shard accounting: hot source spans ceil(90000/8192)=11 shards,
    # every shard's token total <= budget + one spanning doc
    pdf = sharded.groupBy("source", "shard").agg(
        F.sum("n_size").alias("tok")
    ).collect()
    by_src = {}
    for r in pdf:
        by_src.setdefault(r["source"], []).append(r["tok"])
        assert r["tok"] <= budget + 100, (r["source"], r["shard"], r["tok"])
    assert len(by_src["hot"]) == 11
    assert len(by_src["cold"]) == 2  # 10k tokens / 8192 budget

    # the prefix window is per (source, block): the physical plan's
    # window partition spec must include the block id
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "_blk" in plan and "Window" in plan

    with pytest.raises(ValueError, match="shard_budget"):
        pack_chunks_sharded(df, 256, F.col("n"), 0)


# =====================================================================
# Native uncompressed media decode (BMP / PPM / WAV, no libraries)
# =====================================================================


def _encode_bmp(rgb):
    """Minimal 24-bit BI_RGB BMP encoder (bottom-up, 4-byte padded) —
    the inverse of _decode_bmp, written independently from the spec."""
    import struct

    import numpy as np

    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = b""
    for r in range(h - 1, -1, -1):  # bottom-up
        row = rgb[r].tobytes()
        body += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def _encode_ppm(rgb):
    h, w = rgb.shape[:2]
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def _encode_wav(samples_le16: bytes):
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(samples_le16)) + samples_le16
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_native_bmp_ppm_wav_decode_roundtrip():
    import numpy as np

    from ves_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # w=3 -> padded rows
    assert decode_media(_encode_bmp(rgb)) == rgb.tobytes()
    assert decode_media(_encode_ppm(rgb)) == rgb.tobytes()
    pcm = rng.integers(0, 256, size=202, dtype=np.uint8).tobytes()
    assert decode_media(_encode_wav(pcm)) == pcm
    # unknown magic falls through to the Pillow seam
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="Pillow"):
        decode_media(b"\x89PNG....")


def test_multimodal_real_mode_decodes_natively(spark):
    """End-to-end real mode through mapInPandas: BMP/PPM/WAV payloads
    decode without any media library, and the checksum/features are
    computed over the DECODED bytes (not the container bytes)."""
    import numpy as np

    from ves_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    pcm = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
    rows = [
        ("bmp-1", "image", _encode_bmp(rgb), (5, 4, None, None)),
        ("ppm-1", "image", _encode_ppm(rgb), (5, 4, None, None)),
        ("wav-1", "audio", _encode_wav(pcm), (None, None, 16000, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in extract_features(df, decode_mode="real").collect()
    }
    raw = rgb.tobytes()
    want_img = int(sum(raw)) % 1_000_000_007
    assert out["bmp-1"]["checksum"] == want_img
    assert out["ppm-1"]["checksum"] == want_img
    # identical decoded pixels -> identical features, any container
    assert out["bmp-1"]["feat"] == out["ppm-1"]["feat"]
    assert out["wav-1"]["checksum"] == int(sum(pcm)) % 1_000_000_007


def test_resize_nearest_shape_and_identity():
    import numpy as np

    from ves_spark.operators.multimodal import resize_nearest

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    # identity resize returns the same pixels
    assert (resize_nearest(rgb, 8, 6) == rgb).all()
    small = resize_nearest(rgb, 4, 3)
    assert small.shape == (4, 3, 3)
    # 2x downscale picks the centered source sample
    assert (small == rgb[1::2][:, 1::2]).all()
