"""Exact-substring (k-token window) deduplication over token arrays.

The tokens-payload flagship of the dedup family: find every span of
``k`` consecutive tokens that occurs at least ``min_count`` times
anywhere in the corpus (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better" — the ExactSubstr criterion, expressed
as a distributed windowed-hash plan instead of a single-node suffix
array), then merge overlapping hits per document into maximal spans.

Reference basis: the reference dedups whole units by content identity
(src/watcher/discovery.rs:33-35); this extends the same
exactly-once-by-content idea below unit granularity, which whole-doc
hashing cannot see (a 200-token boilerplate header shared by millions
of otherwise-unique docs).

100 TB design:

* Gram generation is map-side only: a ``transform(sequence(...))``
  higher-order function inside the scan stage — no Python, no UDF.
* The only per-gram shuffle carries (8-byte hash, partial count)
  pairs with map-side combine; the dup-gram set that survives
  ``min_count`` is a strict subset keyed by the same hash, so the
  hit join is a plain equi-join AQE can size (and skew-split: a gram
  repeated 10^8 times is exactly the skewed-key case AQE's skew join
  handles).
* Span merging is a per-document window over only the HIT positions
  (dup positions per doc << n_tok in healthy corpora), partitioned
  on doc_id — the same key the corpus is bucketed on, so with
  bucketed inputs the window needs no exchange.
* ``hash_mode='xxhash64'`` (default) hashes the token slice directly
  JVM-side — no string materialization. ``'md5'`` builds a
  separator-joined string first: slower, but byte-replayable by the
  DuckDB oracle, which is how the driver checks this operator
  cross-engine. Both modes produce identical spans absent hash
  collisions (asserted in tests); at 10^12 sequences a 64-bit space
  holds ~10^15 grams, so the scale path should re-verify hash-equal
  gram pairs against token bytes exactly as decontaminate() does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ves_spark.operators.spread import spread

# ASCII unit separator: cannot appear inside a token rendered from a
# token-id integer, and is vanishingly rare in natural-language words —
# prevents "a,b"+"c" vs "a"+"b,c" join-key collisions.
_SEP = "char(31)"


def _gram_hash_expr(tokens_col: str, k: int, hash_mode: str) -> str:
    """SQL expr: array of one hash per k-token window start position.

    Empty array for docs shorter than k (sequence() would otherwise
    count DOWN from 0 to a negative stop and emit phantom positions).
    """
    if hash_mode == "xxhash64":
        body = f"xxhash64(slice({tokens_col}, i + 1, {k}))"
    elif hash_mode == "md5":
        body = (
            f"md5(concat_ws({_SEP}, transform("
            f"slice({tokens_col}, i + 1, {k}), x -> cast(x AS string))))"
        )
    else:
        raise ValueError(f"hash_mode must be 'xxhash64' or 'md5', got {hash_mode!r}")
    return (
        f"CASE WHEN size({tokens_col}) >= {k} THEN "
        f"transform(sequence(0, size({tokens_col}) - {k}), i -> {body}) "
        f"ELSE array() END"
    )


def duplicate_spans(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document maximal duplicated spans.

    Returns one row per (doc, maximal span): ``(id_col, span_start,
    span_end, span_tokens)`` where positions are 0-based token offsets
    and the span covers every position hit by a k-gram occurring
    ``min_count``+ times corpus-wide, with overlapping/adjacent
    windows merged (gaps-and-islands on the hit positions).
    """
    toks = spread(df.select(id_col, tokens_col), id_col)
    grams = toks.select(
        id_col,
        F.posexplode(F.expr(_gram_hash_expr(tokens_col, k, hash_mode))).alias(
            "pos", "g"
        ),
    )
    # one explicit exchange on the gram hash feeds BOTH the dup-gram
    # count and the hit join (the count's output keeps
    # hashpartitioning(g), so the join adds no exchange, and the gram
    # generation itself runs once — the second consumer reads the
    # first's shuffle output via ReusedExchange instead of re-hashing
    # the corpus)
    p = df.sparkSession.sparkContext.defaultParallelism
    grams = grams.repartition(p, "g")
    dup = grams.groupBy("g").count().filter(F.col("count") >= min_count).select("g")
    hits = grams.join(dup, "g").select(id_col, "pos")

    w = W.partitionBy(id_col).orderBy("pos")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # Fixed k makes window ends monotone in pos, so the classic
    # cummax-of-end island test reduces to a lag() on pos: a new
    # island starts when the previous window [prev, prev+k-1] leaves
    # at least one uncovered position before this one (pos > prev+k).
    marked = hits.withColumn(
        "ni",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + k),
            1,
        ).otherwise(0),
    ).withColumn("island", F.sum("ni").over(run))
    return (
        marked.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k)).alias("span_tokens"),
        )
        .drop("island")
    )


def duplicate_span_coverage(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-token coverage rollup.

    ``(id_col, n_tok, n_spans, dup_tokens, dup_frac)`` for every doc
    with at least one duplicated span — the ranking signal an
    ExactSubstr cleaning pass thresholds on.
    """
    spans = duplicate_spans(df, k, min_count, id_col, tokens_col, hash_mode)
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    n = df.select(
        id_col, F.size(tokens_col).cast("long").alias("n_tok")
    )
    return per_doc.join(n, id_col).select(
        id_col,
        "n_tok",
        "n_spans",
        "dup_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tok"), 4).alias("dup_frac"),
    )


def strip_duplicate_spans(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hash_mode: str = "xxhash64",
    keep_first: bool = False,
) -> DataFrame:
    """Rewrite ``tokens_col`` with every duplicated span removed.

    The cleaning counterpart of :func:`duplicate_spans`: docs keep
    only positions no maximal span covers. ``keep_first=False``
    removes ALL occurrences (Lee et al.'s conservative variant —
    dedup decisions stay embarrassingly parallel; keeping exactly one
    canonical occurrence would need a global tie-break pass like
    components.keeper selection). Span lists ride a per-doc
    collect_list (bounded: spans per doc <= n_tok / k) and the strip
    itself is a JVM higher-order filter with a positional lambda —
    zero Python per row.
    """
    if keep_first:
        raise NotImplementedError(
            "keep-one-occurrence needs a corpus-global canonical-occurrence "
            "tie-break (see operators/components.py keeper selection); the "
            "drop-all variant is the one Lee et al. ship"
        )
    spans = duplicate_spans(df, k, min_count, id_col, tokens_col, hash_mode)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    out = df.join(per_doc, id_col, "left")
    cleaned = F.when(F.col("_spans").isNull(), F.col(tokens_col)).otherwise(
        F.expr(
            f"filter({tokens_col}, (x, i) -> "
            f"NOT exists(_spans, s -> i >= s.span_start AND i <= s.span_end))"
        )
    )
    return out.withColumn(tokens_col, cleaned).drop("_spans")
