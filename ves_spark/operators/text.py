"""Text analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in Spark SQL expressions (JVM, codegen'd) — these
run inside the same stage as the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ves_spark.operators.spread import spread

# A tiny English stopword list — enough for a ratio heuristic.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
]

# BPE-ish token pattern: word pieces, numbers, or single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (proxy for tokenizer token count)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / word-length features plus a
    composite quality score in [0,1]."""
    col = F.col(text_col)
    words = F.split(F.trim(col), r"\s+")
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_words = F.size(words)
    n_chars = F.length(col)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, F.lower(w))))
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
    mean_wlen = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars_m", n_chars)
        .withColumn("stop_ratio", F.round(n_stop / F.greatest(n_words, F.lit(1)), 4))
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("mean_word_len", F.round(mean_wlen, 4))
    )
    # composite: reward mid-length docs with some stopwords, few puncts
    score = (
        F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stop_ratio") * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 10, F.lit(1.0))) * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 4))


def langid_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic language ID: English stopword hit-ratio vs an ASCII
    ratio; predicts 'en' above a threshold, else 'other'. (A real
    system plugs a fastText-style model in as a pandas UDF — this
    keeps the contract testable without model weights.)"""
    col = F.col(text_col)
    words = F.split(F.lower(F.trim(col)), r"\s+")
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    hit_ratio = F.size(F.filter(words, lambda w: F.array_contains(stop, w))) / F.greatest(
        F.size(words), F.lit(1)
    )
    ascii_ratio = F.length(F.regexp_replace(col, r"[^\x00-\x7F]", "")) / F.greatest(
        F.length(col), F.lit(1)
    )
    return (
        df.withColumn("en_score", F.round(hit_ratio, 4))
        .withColumn("ascii_ratio", F.round(ascii_ratio, 4))
        .withColumn(
            "lang_pred",
            F.when((hit_ratio > 0.02) & (ascii_ratio > 0.9), "en").otherwise("other"),
        )
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word n-grams (with duplicates, in
    order); empty for docs with < n words. Pure JVM higher-order
    functions — sequence + transform(slice) — so it stays inside
    whole-stage codegen. The short-doc case needs an explicit empty
    branch: Spark's sequence(1, stop) counts DOWN when stop < 1,
    which would feed slice() an illegal start of 0.

    PERF: ``col`` should be an already-materialized ARRAY column
    (an attribute), not a split() expression — an expression passed
    here is re-evaluated once per transform element (the lambda body
    closes over it), turning an O(words) op into O(words^2) per doc
    (measured 12x on the repetition query). DataFrame-level callers
    below materialize the words array with withColumn first."""
    return F.when(
        F.size(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(col) - (n - 1)),
            lambda i: F.array_join(F.slice(col, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _with_ngrams(df: DataFrame, text_col: str, n: int, out: str) -> DataFrame:
    """Materialize words, then n-grams, as real columns (two project
    steps). Catalyst's CollapseProject keeps multiply-referenced
    non-cheap expressions un-inlined, so the split and the gram
    array are each computed ONCE per row no matter how many
    downstream expressions consume them."""
    return df.withColumn("_w", F.split(F.trim(F.col(text_col)), r"\s+")).withColumn(
        out, word_ngrams(F.col("_w"), n)
    )


def repetition_features(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Repeated-n-gram fraction per document (the Gopher-style
    repetition filter: natural text repeats few n-grams; boilerplate,
    keyword stuffing, and decode loops repeat many).

    rep_ratio = 1 - distinct_ngrams / total_ngrams  (0 for docs with
    < n words). Map-only — no shuffle, no UDF: the whole computation
    is split/transform/array_distinct inside one codegen stage, so at
    100 TB it rides the scan."""
    g = (
        _with_ngrams(df, text_col, n, "_grams")
        .withColumn("n_ngrams", F.size("_grams"))
        .withColumn("n_distinct", F.size(F.array_distinct("_grams")))
    )
    total, distinct = F.col("n_ngrams"), F.col("n_distinct")
    return g.withColumn(
        "rep_ratio",
        F.round(F.when(total > 0, 1 - distinct / total).otherwise(F.lit(0.0)), 4),
    ).drop("_w", "_grams")


def contaminated_docs(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing any
    word n-gram with a benchmark/eval set (the standard train-test
    leakage check for LLM corpora; n=5..13 words in practice).

    Returns one row per contaminated doc: (id, n_hit_ngrams = how
    many DISTINCT of its n-grams appear anywhere in the benchmark,
    n_bench_docs = how many distinct benchmark docs it collides
    with).

    Scale shape: the benchmark side is tiny (eval sets are MBs) —
    its distinct n-grams are BROADCAST, so the corpus side is a
    map-side hash probe riding the scan: no shuffle of the 100 TB
    side. The JOIN KEY is the 8-byte xxhash64 of the n-gram (small
    broadcast hashmap, cheap probe), but every hit is re-verified
    against the actual gram string before counting: at ~10^12 corpus
    grams x ~10^7 bench grams, expected 64-bit cross-collisions are
    in the hundreds — without the verify they would brand clean docs
    as contaminated (and diverge from a string-equality oracle). The
    verify is free at scale: it only runs on hits, and hits are
    rare."""
    d_grams = (
        _with_ngrams(spread(docs, id_col), text_col, n, "_grams")
        .select(F.col(id_col), F.explode(F.array_distinct("_grams")).alias("_g"))
        .select(id_col, "_g", F.xxhash64("_g").alias("_gh"))
    )
    b_grams = (
        _with_ngrams(bench, text_col, n, "_grams")
        .select(
            F.col(bench_id_col), F.explode(F.array_distinct("_grams")).alias("_bg")
        )
        .select(bench_id_col, "_bg", F.xxhash64("_bg").alias("_gh"))
        .distinct()
    )
    hits = d_grams.join(F.broadcast(b_grams), "_gh").filter(
        F.col("_g") == F.col("_bg")  # collision re-verify, hits only
    )
    return hits.groupBy(id_col).agg(
        F.countDistinct("_g").alias("n_hit_ngrams"),
        F.countDistinct(bench_id_col).alias("n_bench_docs"),
    )


FP_MOD = 1_000_000_007
FP_BASE = 31


def fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over words, mod 1e9+7 (order-sensitive
    document fingerprint). Computed as a JVM fold; each step keeps the
    accumulator < 2^60 so ANSI mode can't overflow:
        acc' = (acc * 31 + (xxhash64(word) mod M)) mod M
    """
    words = F.split(F.trim(col), r"\s+")
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (
            acc * FP_BASE + F.pmod(F.xxhash64(w), F.lit(FP_MOD))
        ) % FP_MOD,
    )


# =====================================================================
# PII redaction
# =====================================================================

# Patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
# \b word boundaries — no backrefs, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def pii_features(df: DataFrame, text_col: str) -> DataFrame:
    """PII detection + redaction — the scrubbing stage every
    training-data pipeline runs before tokenization (emails, IPv4
    addresses, phone numbers → typed placeholders).

    The three redactions are applied as a fixed pipeline (email → ip
    → phone) and each detector COUNTS on the output of the previous
    stage, so counts and the final redacted text are one consistent
    story (an email's digits can never double-count as a phone).

    Scale shape: pure JVM ``regexp_replace`` / ``regexp_extract_all``
    — map-only, codegen'd, zero shuffle; rides the scan at any scale.
    Adds columns: n_emails, n_ipv4, n_phones, redacted."""
    col = F.col(text_col)
    red1 = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    red2 = F.regexp_replace(red1, PII_IPV4_RE, "<IP>")
    red3 = F.regexp_replace(red2, PII_PHONE_RE, "<PHONE>")
    return (
        df.withColumn(
            "n_emails", F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0))
        )
        .withColumn(
            "n_ipv4", F.size(F.regexp_extract_all(red1, F.lit(PII_IPV4_RE), 0))
        )
        .withColumn(
            "n_phones", F.size(F.regexp_extract_all(red2, F.lit(PII_PHONE_RE), 0))
        )
        .withColumn("redacted", red3)
    )


def char_bigrams(col_name: str) -> Column:
    """Array of character bigrams of a string column (empty below two
    chars) — a JVM higher-order transform riding the scan, no explode
    yet."""
    return F.expr(
        f"CASE WHEN char_length(`{col_name}`) >= 2 THEN "
        f"transform(sequence(1, char_length(`{col_name}`) - 1), "
        f"i -> substring(`{col_name}`, i, 2)) "
        f"ELSE CAST(array() AS array<string>) END"
    )


# Codepoints are < 0x110000 = 1114112, so cp1 * 1114112 + cp2 is a
# bijective encoding of a character bigram into one BIGINT.
_CP_BASE = 1114112


def char_bigram_codes(col_name: str) -> Column:
    """Character bigrams as packed codepoint-pair BIGINTs (empty below
    two chars) — the bijective integer form of :func:`char_bigrams`:
    grouping/joining on the code is exactly grouping/joining on the
    bigram string, but the keys are 8-byte longs instead of per-
    position string allocations (guide §2.3: narrower types)."""
    return F.expr(
        f"CASE WHEN char_length(`{col_name}`) >= 2 THEN "
        f"transform(sequence(1, char_length(`{col_name}`) - 1), "
        f"i -> CAST(ascii(substring(`{col_name}`, i, 1)) AS BIGINT) "
        f"* {_CP_BASE} + ascii(substring(`{col_name}`, i + 1, 1))) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )


def char_bigram_codes_from_chars(chars_col: str) -> Column:
    """:func:`char_bigram_codes` over an already-materialized
    codepoint ARRAY column (``split(text, '')`` — which splits by
    CODEPOINT, surrogate pairs included, exactly like
    ``substring(text, i, 1)``). The substring form walks the UTF-8
    string once PER POSITION — O(chars²) per document, measured as
    the dominant cost of the fluency query — while ``element_at`` on
    the array is O(1), so this is O(chars). The column must be a real
    attribute, not an expression: a lambda body re-evaluates a passed
    expression once per element (see :func:`word_ngrams`)."""
    c = chars_col
    return F.expr(
        f"CASE WHEN size(`{c}`) >= 2 THEN "
        f"transform(sequence(1, size(`{c}`) - 1), "
        f"i -> CAST(ascii(element_at(`{c}`, i)) AS BIGINT) "
        f"* {_CP_BASE} + ascii(element_at(`{c}`, i + 1))) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )


def lm_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smooth_v: int = 96,
    quant: int = 1 << 30,
) -> DataFrame:
    """Character-bigram language-model fluency score per document —
    the CCNet-style LM quality filter, self-trained on the scored
    corpus (no external model): score = mean over positions of the
    add-one-smoothed transition probability
    ``(count(bigram) + 1) / (count(prefix char) + smooth_v)``.

    Gibberish (rare transitions) scores low, fluent text scores high;
    threshold on ``lm_score`` exactly like a perplexity cut (the
    classic mean-log-prob variant is monotone-equivalent for ranking
    but needs ln(), whose last-ulp varies across libm builds — this
    formulation uses ONLY correctly-rounded IEEE-754 ops, so any
    engine reproduces it bit-for-bit: probabilities are one double
    division each, scaled by an exact power-of-two and floored to
    longs so the per-doc mean is an order-independent integer sum).

    100 TB shape: the model is one map-side-combined groupBy over a
    bounded key space (char-pair grams), broadcast back; doc scoring
    explodes bigrams map-side, joins the broadcast model, and the
    per-doc mean partial-aggregates before its only shuffle.

    Internally bigrams are packed codepoint-pair longs
    (:func:`char_bigram_codes` — bijective with the bigram string),
    so the model aggregation and the broadcast probe hash 8-byte
    keys, never per-position strings; counts, probabilities and
    scores are identical to the string-keyed formulation."""
    # The code arrays feed THREE consumers (model counts, prefix
    # counts, scoring) — materialize them once. An exchange-reuse
    # formulation was tried and reverted: the three consumers'
    # exchange subtrees did not dedupe at runtime and the codes were
    # recomputed per branch (measured 80 s at sf0.1 vs 1.4 s with the
    # checkpoint).
    codes = (
        spread(df, id_col)
        .withColumn("_chars", F.expr(f"split(`{text_col}`, '')"))
        .select(
            id_col, char_bigram_codes_from_chars("_chars").alias("_codes")
        )
        .localCheckpoint(eager=True)
    )
    toks = codes.select(id_col, F.explode("_codes").alias("bg"))
    model = toks.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    prefix = model.groupBy(
        F.expr(f"bg DIV {_CP_BASE}").alias("pc")
    ).agg(F.sum("c_bg").alias("c_pre"))
    model = model.join(
        F.broadcast(prefix), F.expr(f"(bg DIV {_CP_BASE}) = pc")
    ).select("bg", "c_bg", "c_pre")
    # p is one correctly-rounded division; * quant is an exact
    # exponent shift; floor is exact -> the long sum is engine-free.
    q = F.floor(
        (F.col("c_bg") + F.lit(1).cast("double"))
        / (F.col("c_pre") + F.lit(float(smooth_v)))
        * F.lit(float(quant))
    )
    scored = toks.join(F.broadcast(model.withColumn("_q", q)), "bg")
    return (
        scored.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("_q").alias("_s"))
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.col("_s") / (F.col("n_bigrams") * F.lit(float(quant))), 6
            ).alias("lm_score"),
        )
    )
