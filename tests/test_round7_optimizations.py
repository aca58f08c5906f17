"""Round-7 optimization equivalence tests: every operator whose
INTERNALS changed this round is pinned to its previous formulation
bit-for-bit on planted data (the driver's oracle re-checks the
registered queries; these cover the operator surfaces directly,
including parameterizations the registry does not exercise)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F


def _docs(spark, n=60, seed=7):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(n):
        words = [rng.choice(vocab) for _ in range(rng.randrange(3, 40))]
        rows.append((i, " ".join(words)))
        if i % 5 == 0:  # planted near-dup: drop the last word
            rows.append((i + 10_000, " ".join(words[:-1])))
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------ ngram


def _ngram_jaccard_reference(df, k, threshold, max_df=None):
    """The pre-round-7 formulation (string-keyed self-join + sizes
    joins), kept verbatim as the semantic reference."""
    from ves_spark.operators.dedup import _cap_buckets, word_shingles

    sh = df.select(
        F.col("doc_id").alias("_id"),
        F.explode(word_shingles(F.col("text"), k)).alias("s"),
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    if max_df is not None:
        sh = _cap_buckets(sh, ["s"], max_df)
    a, b = sh.alias("a"), sh.alias("b")
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


@pytest.mark.parametrize("max_df", [None, 8])
def test_ngram_jaccard_matches_reference_formulation(spark, max_df):
    from ves_spark.operators.dedup import ngram_jaccard_pairs

    df = _docs(spark)
    got = sorted(
        map(tuple, ngram_jaccard_pairs(df, "text", "doc_id", k=3,
                                       threshold=0.2, max_df=max_df).collect())
    )
    want = sorted(
        map(tuple, _ngram_jaccard_reference(df, 3, 0.2, max_df).collect())
    )
    assert got == want and len(got) > 0


def test_ngram_jaccard_all_count_plans_agree(spark, monkeypatch):
    """The four pair-count plans — numpy posting-list kernel (the
    default local plan), packed-key broadcast probe, packed-key
    shuffle (the 100 TB plan, forced via broadcast_index_rows=0), and
    the unpacked fallback (forced via ids outside the packable range)
    — return identical rows."""
    from ves_spark.operators.dedup import (
        _ngram_jaccard_pairs_unpacked,
        ngram_jaccard_pairs,
    )

    df = _docs(spark)
    want = sorted(map(tuple, _ngram_jaccard_reference(df, 3, 0.2).collect()))

    def run():
        return sorted(
            map(
                tuple,
                ngram_jaccard_pairs(
                    df, "text", "doc_id", k=3, threshold=0.2,
                    broadcast_index_rows=10**9,
                ).collect(),
            )
        )

    monkeypatch.setenv("SPARK_GRAFT_NGRAM_IMPL", "kernel")
    kernel = run()
    monkeypatch.setenv("SPARK_GRAFT_NGRAM_IMPL", "broadcast")
    bcast = run()
    monkeypatch.delenv("SPARK_GRAFT_NGRAM_IMPL")
    shuffle = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                df, "text", "doc_id", k=3, threshold=0.2,
                broadcast_index_rows=0,
            ).collect(),
        )
    )
    unpacked = sorted(
        map(
            tuple,
            _ngram_jaccard_pairs_unpacked(
                df, "text", "doc_id", 3, 0.2, None
            ).collect(),
        )
    )
    assert kernel == want and bcast == want
    assert shuffle == want and unpacked == want
    assert len(want) > 0


def test_ngram_jaccard_unpackable_ids_take_fallback(spark):
    """Negative doc ids cannot ride the packed key; the operator must
    detect that on the materialized stats and still return the exact
    row set via the unpacked plan."""
    from ves_spark.operators.dedup import ngram_jaccard_pairs

    df = _docs(spark).withColumn(
        "doc_id", F.col("doc_id") - F.lit(20_000)
    )
    got = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.2).collect(),
        )
    )
    want = sorted(map(tuple, _ngram_jaccard_reference(df, 3, 0.2).collect()))
    assert got == want and len(got) > 0


# ---------------------------------------------------------- minhash


def test_minhash_candidates_match_hof_signature_banding(spark):
    """The explode+min-agg signature must band identically to the
    per-row array_min(transform(...)) HOF it replaced."""
    from ves_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
        word_shingles,
    )

    df = _docs(spark)
    n_hashes, bands, r = 16, 4, 4
    got = sorted(
        map(
            tuple,
            minhash_lsh_candidates(
                df, "text", "doc_id", n_hashes=n_hashes, bands=bands
            ).collect(),
        )
    )
    # reference banding from the HOF signature
    sig = df.select(
        F.col("doc_id").alias("_id"),
        minhash_signature(word_shingles(F.col("text"), 3), n_hashes).alias("_sig"),
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
    l, rr = banded.alias("l"), banded.alias("r")
    want = sorted(
        map(
            tuple,
            l.join(
                rr,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col("l._id") < F.col("r._id")),
            )
            .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
            .distinct()
            .collect(),
        )
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------- near_pairs sig


def test_near_pairs_filter_before_distinct_is_bruteforce_exact(spark):
    """filter-then-distinct must return exactly the brute-force
    Hamming pair set (old order was distinct-then-filter)."""
    from ves_spark.operators.dedup import near_pairs_from_sig

    rng = random.Random(11)
    rows = []
    for i in range(80):
        sig = rng.getrandbits(60)
        rows.append((i, sig))
        if i % 4 == 0:  # plant a near pair within radius
            rows.append((i + 1000, sig ^ (1 << rng.randrange(60))))
    df = spark.createDataFrame(rows, "_id long, sig long")
    got = sorted(
        map(
            tuple,
            near_pairs_from_sig(df, "_id", "sig", n_bits=60, max_hamming=8).collect(),
        )
    )
    data = dict(rows)
    want = sorted(
        (a, b, bin(data[a] ^ data[b]).count("1"))
        for a in data
        for b in data
        if a < b and bin(data[a] ^ data[b]).count("1") <= 8
    )
    assert got == want and len(got) > 0


# ------------------------------------------------ fixed-dim cosine


def test_dot_norm_fixed_bit_identical_to_fold(spark):
    from ves_spark.operators.similarity import (
        _dot_literal_sql,
        dot,
        dot_fixed,
        l2_norm,
        norm_fixed,
    )

    rng = random.Random(3)
    dim = 16
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)],
         [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, a array<float>, b array<float>")
    out = df.select(
        (dot(F.col("a"), F.col("b")) - dot_fixed("a", "b", dim)).alias("dd"),
        (l2_norm(F.col("a")) - norm_fixed("a", dim)).alias("dn"),
    ).agg(F.max(F.abs("dd")), F.max(F.abs("dn"))).collect()[0]
    assert out[0] == 0.0 and out[1] == 0.0  # bit-identical, not approx

    lit_vec = [rng.uniform(-1, 1) for _ in range(dim)]
    fold = (
        "aggregate(zip_with(`a`, array("
        + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in lit_vec)
        + "), (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    d = df.select(
        (F.expr(fold) - F.expr(_dot_literal_sql("a", lit_vec))).alias("d")
    ).agg(F.max(F.abs("d"))).collect()[0][0]
    assert d == 0.0


# --------------------------------------------------- asof aggregate


def test_max_struct_equals_window_top1(spark):
    """max(struct(ts, key)) == row_number()-over-desc-desc top-1 on
    data with duplicate timestamps per group."""
    from pyspark.sql import Window as W

    rng = random.Random(5)
    rows = [
        (i % 17, rng.randrange(50), i)  # (grp, ts_int, unique key)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g long, t long, k long")
    w = W.partitionBy("g").orderBy(F.col("t").desc(), F.col("k").desc())
    want = sorted(
        map(
            tuple,
            df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("g", "t", "k")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            df.groupBy("g")
            .agg(F.max(F.struct("t", "k")).alias("m"))
            .select("g", "m.t", "m.k")
            .collect(),
        )
    )
    assert got == want


# ------------------------------------------------- lm bigram codes


def test_char_bigram_codes_bijective_with_strings(spark):
    from ves_spark.operators.text import _CP_BASE, char_bigram_codes, char_bigrams

    rows = [(1, "hello world"), (2, "aa"), (3, "x"), (4, ""), (5, "héllo ü")]
    df = spark.createDataFrame(rows, "i long, t string")
    out = df.select(
        char_bigrams("t").alias("s"), char_bigram_codes("t").alias("c")
    ).collect()
    for r in out:
        assert len(r["s"]) == len(r["c"])
        for s, c in zip(r["s"], r["c"]):
            assert c == ord(s[0]) * _CP_BASE + ord(s[1])


def test_char_bigram_codes_from_chars_equals_substring_form(spark):
    """The O(chars) split('')/element_at form returns exactly the
    O(chars^2) substring form's codes — including non-ASCII, non-BMP
    (surrogate-pair) codepoints, nulls and short strings."""
    from pyspark.sql import functions as F

    from ves_spark.operators.text import (
        char_bigram_codes,
        char_bigram_codes_from_chars,
    )

    rows = [
        (1, "hello world"),
        (2, "aa"),
        (3, "x"),
        (4, ""),
        (5, "héllo ü"),
        (6, "a\U0001F389b\U0001F680"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = (
        df.withColumn("_chars", F.expr("split(`t`, '')"))
        .select(
            char_bigram_codes("t").alias("old"),
            char_bigram_codes_from_chars("_chars").alias("new"),
        )
        .collect()
    )
    for r in out:
        assert r["old"] == r["new"]
