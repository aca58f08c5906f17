"""Text analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in Spark SQL expressions (JVM, codegen'd) — these
run inside the same stage as the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
