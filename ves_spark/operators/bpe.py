"""Distributed byte-pair-encoding (BPE) vocabulary training and
encoding over token-array columns — the tokenizer-construction stage
of an LLM data pipeline, expressed as DataFrame ops.

BPE training is inherently iterative (each merge changes the pair
statistics the next merge is chosen from), so the round structure is
irreducible; what CAN be distributed is everything inside a round:

* pair counting is ``posexplode``-free — a map-side
  ``transform(sequence(...))`` zips each token with its successor
  inside the scan stage, and the groupBy count map-side-combines, so
  the only shuffled bytes per round are (pair, partial-count) rows
  over the bounded live-pair key space, NOT the corpus;
* the argmax merge pick is a tiny ``orderBy().limit(1)`` on the
  aggregated pair table (driver sees one row per round);
* applying a merge rewrites every token array map-only with a JVM
  ``aggregate`` fold (left-to-right greedy collapse, zero Python);
  rounds chain lazily and a ``localCheckpoint`` every few rounds
  truncates the exponentially-referencing lineage.

At 100 TB the corpus is never shuffled by training: each round is one
scan + one metadata-sized aggregate. The classic single-machine
trainer (counts in a hash map) is the oracle, implemented in
`ref_train_bpe` below and asserted equal in tests.

Reference basis: the reference's payloads are raw bytes destined for
a tokenization/normalization stage that is declared but absent
(`/root/reference/components/core-agent/src/tailer/manager.rs:28-29`);
`BASELINE.json` pins the rebuilt pipeline's payload axis to
pre-tokenized sequences, and this operator is how those sequences'
vocabulary is produced in the first place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bpe", "apply_bpe", "ref_train_bpe", "ref_apply_bpe"]


def _merge_fold_expr(col_expr: str, a: int, b: int, new_id: int) -> str:
    """SQL for one greedy left-to-right merge pass over an int array:
    fold the array, appending either the merged id (when the running
    tail is `a` and the next token is `b`) or the plain token. The
    accumulator carries a 1-flag marking "previous element was just
    consumed by a merge" so overlapping occurrences (a b b, a a b)
    collapse exactly like the scalar reference."""
    return (
        f"aggregate({col_expr}, "
        # acc: struct(out array, merged flag for the previous step)
        f"struct(CAST(array() AS array<int>) AS o, false AS m), "
        f"(acc, x) -> IF(NOT acc.m AND size(acc.o) > 0 "
        f"AND element_at(acc.o, -1) = {a} AND x = {b}, "
        f"struct(concat(slice(acc.o, 1, size(acc.o) - 1), "
        f"array(CAST({new_id} AS int))) AS o, true AS m), "
        f"struct(concat(acc.o, array(x)) AS o, false AS m)), "
        f"acc -> acc.o)"
    )


def _pair_counts(toks: DataFrame, col: str) -> DataFrame:
    """(first, second) adjacent-pair counts over all arrays — pairs
    are built inside the scan stage (transform over an index
    sequence), so only (pair, partial count) rows shuffle."""
    pairs = toks.select(
        F.explode(
            F.expr(
                f"CASE WHEN size(`{col}`) >= 2 THEN "
                f"transform(sequence(1, size(`{col}`) - 1), "
                f"i -> struct(element_at(`{col}`, i) AS a, "
                f"element_at(`{col}`, i + 1) AS b)) "
                f"ELSE CAST(array() AS array<struct<a:int,b:int>>) END"
            )
        ).alias("p")
    )
    return pairs.groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("n"))


def train_bpe(
    toks: DataFrame,
    col: str = "tokens",
    n_merges: int = 10,
    min_count: int = 2,
    next_id: int | None = None,
    checkpoint_every: int = 4,
) -> list[tuple[int, int, int]]:
    """Learn ``n_merges`` BPE merges over an ``array<int>`` column.

    Returns ``[(a, b, new_id), ...]`` in merge order (rank order).
    Tie-break on equal counts is (a, b) ascending — deterministic
    across engines and partitionings. Stops early when no pair
    reaches ``min_count``. ``next_id`` defaults to max(token) + 1.
    """
    if next_id is None:
        next_id = (
            toks.select(
                F.max(F.expr(f"array_max({col})")).alias("m")
            ).collect()[0]["m"]
            or 0
        ) + 1
    cur = toks.select(F.col(col).cast("array<int>").alias(col))
    merges: list[tuple[int, int, int]] = []
    for r in range(n_merges):
        top = (
            _pair_counts(cur, col)
            .filter(F.col("n") >= min_count)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = int(top[0]["a"]), int(top[0]["b"])
        merges.append((a, b, next_id))
        cur = cur.select(
            F.expr(_merge_fold_expr(f"`{col}`", a, b, next_id)).alias(col)
        )
        next_id += 1
        # The fold chains one plan level per round; checkpoint so the
        # analyzer/codegen cost stays linear in rounds, not in the
        # full chained expression depth.
        if (r + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges


def apply_bpe(
    df: DataFrame, merges: list[tuple[int, int, int]], col: str = "tokens"
) -> DataFrame:
    """Encode token arrays with a learned merge table: apply every
    merge in rank order, each as one JVM fold pass — map-only, the
    merge table is a driver-side literal (metadata-sized, the same
    role as broadcast centroids in the IVF operator). Matches the
    scalar reference encoder (`ref_apply_bpe`) exactly because BPE's
    rank-greedy encode IS sequential rank-order pass application.

    Expression depth grows with the merge count, so this path is for
    SMALL merge tables (tens of merges — demos, ablations); a
    production-size vocabulary (tens of thousands of merges) would
    nest past parser/codegen limits. Use :func:`apply_bpe_pandas` for
    that regime — Arrow-batched, one pass per doc regardless of merge
    count."""
    if len(merges) > 64:
        raise ValueError(
            f"apply_bpe chains one SQL fold per merge; {len(merges)} "
            "merges would nest past analyzer limits — use "
            "apply_bpe_pandas for large merge tables"
        )
    expr = f"`{col}`"
    for a, b, new_id in merges:
        expr = _merge_fold_expr(expr, a, b, new_id)
    return df.withColumn(col, F.expr(expr).cast("array<int>"))


def apply_bpe_pandas(
    df: DataFrame, merges: list[tuple[int, int, int]], col: str = "tokens"
) -> DataFrame:
    """Production-scale BPE encoder: the merge table (any size) is
    shipped once per executor inside an Arrow-batched ``mapInPandas``
    kernel; each document is encoded in one pass per applicable merge
    RANK with dict lookups — no SQL expression nesting, no per-row
    Python (Arrow moves whole column batches). Semantics identical to
    :func:`apply_bpe` / `ref_apply_bpe`: merges applied in rank
    order, left-greedy within a pass."""
    rank: dict[tuple[int, int], tuple[int, int]] = {
        (a, b): (r, new_id) for r, (a, b, new_id) in enumerate(merges)
    }
    out_schema = df.schema

    def encode(seq):
        cur = list(seq)
        while True:
            # lowest-rank pair present in the current sequence
            best = None
            for i in range(len(cur) - 1):
                r = rank.get((cur[i], cur[i + 1]))
                if r is not None and (best is None or r[0] < best[0]):
                    best = r
            if best is None:
                return cur
            _, new_id = best
            a, b = merges[best[0]][0], merges[best[0]][1]
            nxt, i = [], 0
            while i < len(cur):
                if i + 1 < len(cur) and cur[i] == a and cur[i + 1] == b:
                    nxt.append(new_id)
                    i += 2
                else:
                    nxt.append(cur[i])
                    i += 1
            cur = nxt

    def batches(it):
        for pdf in it:
            pdf[col] = pdf[col].map(encode)
            yield pdf

    return df.mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------
# Scalar reference (test oracle) — the textbook single-machine trainer.
# ---------------------------------------------------------------------


def _ref_merge_one(seq: list[int], a: int, b: int, new_id: int) -> list[int]:
    out: list[int] = []
    i = 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def ref_train_bpe(
    docs: list[list[int]],
    n_merges: int = 10,
    min_count: int = 2,
    next_id: int | None = None,
) -> list[tuple[int, int, int]]:
    from collections import Counter

    if next_id is None:
        next_id = max((max(d) for d in docs if d), default=-1) + 1
    cur = [list(d) for d in docs]
    merges: list[tuple[int, int, int]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for d in cur:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] += 1
        best = min(
            (p for p, n in counts.items() if n >= min_count),
            key=lambda p: (-counts[p], p),
            default=None,
        )
        if best is None:
            break
        a, b = best
        merges.append((a, b, next_id))
        cur = [_ref_merge_one(d, a, b, next_id) for d in cur]
        next_id += 1
    return merges


def ref_apply_bpe(
    doc: list[int], merges: list[tuple[int, int, int]]
) -> list[int]:
    out = list(doc)
    for a, b, new_id in merges:
        out = _ref_merge_one(out, a, b, new_id)
    return out
