"""Sequence packing: assign documents to fixed-capacity training
chunks (GPT-style pretraining packs the token stream by concatenating
docs in a deterministic order and slicing fixed-size chunks; docs may
span a chunk boundary).

Semantics: within each stream (the partition column), docs are laid
end-to-end in ``order_col`` order; a doc whose exclusive prefix sum
is P occupies token positions [P, P + n_tok) of the stream, i.e.
chunks floor(P/C) .. floor((P + n_tok - 1)/C) at offset P mod C.
Pure window arithmetic — one shuffle on the stream key, everything
else rides whole-stage codegen, and the same SQL runs on any engine
(the driver oracle).

Scale shape (100 TB): ``pack_chunks`` runs one window per stream —
fine while every stream fits a task. ``pack_chunks_sharded`` is the
scale path for skewed sources: it computes the SAME exclusive prefix
sum exactly but decomposed (distributed range-sort → per-partition-
block windows → a metadata-sized block-offset table broadcast back),
so the hot source's scan parallelizes across all cores while the
layout stays bit-identical to the sequential definition; ``shard`` =
floor(tok_start / budget) then caps every downstream stream at the
configured token budget (plus at most one spanning doc). Skewed
sources get more shards, never salting — order stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def pack_chunks(
    df: DataFrame,
    capacity: int,
    size_col: Column,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Adds: tok_start (exclusive prefix sum within the stream),
    chunk_start / chunk_end (first/last chunk the doc touches),
    start_off (offset inside chunk_start)."""
    w = (
        W.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sized = df.withColumn("n_size", size_col.cast("long"))
    prefix = F.coalesce(F.sum("n_size").over(w), F.lit(0).cast("long"))
    return _chunk_cols(sized.withColumn("tok_start", prefix), capacity)


def _chunk_cols(df: DataFrame, capacity: int) -> DataFrame:
    """chunk_start / chunk_end / start_off from an existing tok_start
    (shared by the sequential and sharded paths — the layout rule is
    defined once)."""
    return (
        df.withColumn(
            "chunk_start", F.floor(F.col("tok_start") / capacity).cast("long")
        )
        .withColumn(
            "chunk_end",
            F.floor(
                (F.col("tok_start") + F.greatest(F.col("n_size"), F.lit(1)) - 1)
                / capacity
            ).cast("long"),
        )
        .withColumn("start_off", (F.col("tok_start") % capacity).cast("long"))
    )


def _block_boundaries(
    df: DataFrame, order_col: str, n_blocks: int, per_part: int = 32
) -> list:
    """Sampled cut points over ``order_col`` — our own range-
    partitioner boundary pass (one narrow single-column scan, the
    same extra pass Spark's RangePartitioner makes). Evenly-spaced
    rows are taken from each partition's first Arrow batches (capped
    at ``per_part`` per partition, so the collect is
    O(partitions x per_part) values — metadata scale at any input
    size), then ``n_blocks - 1`` evenly-spaced cut points are drawn
    from the sorted sample. ANY order-preserving cut yields the same
    prefix sums, so sample quality only affects balance, never
    values."""

    def kern(batches):
        import numpy as np

        seen = 0
        for pdf in batches:
            if seen >= per_part or not len(pdf):
                continue
            take = min(per_part - seen, len(pdf))
            seen += take
            idx = np.linspace(0, len(pdf) - 1, num=take, dtype=int)
            yield pdf.iloc[idx][[order_col]]

    field = df.select(order_col).schema[0]
    samp = [
        r[0]
        for r in df.select(order_col)
        .mapInPandas(kern, f"`{order_col}` {field.dataType.simpleString()}")
        .collect()
        if r[0] is not None
    ]
    samp.sort()
    if len(samp) < 2 or n_blocks < 2:
        return []
    cuts = {
        samp[(i * len(samp)) // n_blocks] for i in range(1, n_blocks)
    }
    return sorted(
        c.item() if hasattr(c, "item") else c for c in cuts
    )


def sharded_prefix_sum(
    df: DataFrame,
    size_col: Column,
    part_col: str = "source",
    order_col: str = "doc_id",
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact exclusive prefix sum of ``size_col`` within ``part_col``
    ordered by ``order_col`` — WITHOUT a single per-stream window.

    Classic two-pass scan, Spark-shaped:

    1. ``_blk`` = how many sampled global cut points precede this
       row's ``order_col`` — a PURE COLUMN EXPRESSION over literal
       boundaries (one ``aggregate`` over a literal array, whole-
       stage codegen). Monotone in ``order_col``, so the cut is
       order-preserving within every stream; boundary placement only
       affects balance, never the sums.
    2. local exclusive prefix per (part_col, _blk) — the window's own
       hash shuffle spreads the hot stream's blocks across all cores
       instead of one task.
    3. per-(part_col, _blk) totals are a metadata-sized frame; their
       exclusive running sum per part_col is each block's offset,
       broadcast-joined back. tok_start = block offset + local prefix.

    The block id must NOT come from ``spark_partition_id()`` after a
    ``repartitionByRange`` (the pre-round-6 shape): the exchange is
    consumed by BOTH the window branch and the totals branch, and AQE
    may plan a different coalesced shuffle-read for each consumer —
    the two branches then disagree on the id and the equi-join
    silently DROPS every row whose block id exists on one side only.
    A data-derived ``_blk`` is identical in every branch of every
    plan by construction.

    Adds: ``n_size`` (cast of size_col), ``tok_start``, and ``_blk``
    (the block id, exposed so tests/plans can see the per-block window
    partitioning)."""
    sized = df.withColumn("n_size", size_col.cast("long"))
    if n_blocks is None:
        n_blocks = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    bounds = _block_boundaries(sized, order_col, n_blocks)
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        blk = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(order_col) >= b, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        blk = F.lit(0)
    blocked = sized.withColumn("_blk", blk.cast("long"))
    local_w = (
        W.partitionBy(part_col, "_blk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = blocked.withColumn(
        "_local", F.coalesce(F.sum("n_size").over(local_w), F.lit(0).cast("long"))
    )
    totals = blocked.groupBy(part_col, "_blk").agg(F.sum("n_size").alias("_btot"))
    off_w = (
        W.partitionBy(part_col)
        .orderBy("_blk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_btot").over(off_w), F.lit(0).cast("long"))
    ).select(part_col, "_blk", "_off")
    return (
        local.join(F.broadcast(offsets), [part_col, "_blk"])
        .withColumn("tok_start", (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_local", "_off")
    )


def pack_chunks_sharded(
    df: DataFrame,
    capacity: int,
    size_col: Column,
    shard_budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """``pack_chunks`` layout (bit-identical tok_start/chunk ids) via
    the scalable decomposed scan, plus size-aware shard keys: shard =
    floor(tok_start / shard_budget), so every (part_col, shard) stream
    holds at most ``shard_budget`` tokens of start positions (≤ budget
    + one spanning doc of actual tokens) regardless of source skew —
    downstream per-stream work (chunk writers, per-shard shuffles)
    is bounded by the budget, and a source holding 90% of all tokens
    simply gets proportionally more shards."""
    if shard_budget <= 0:
        raise ValueError(f"shard_budget must be positive, got {shard_budget}")
    pre = sharded_prefix_sum(df, size_col, part_col, order_col)
    return _chunk_cols(pre, capacity).withColumn(
        "shard", F.floor(F.col("tok_start") / shard_budget).cast("long")
    ).drop("_blk")


def deterministic_shuffle(
    df: DataFrame,
    seed: int,
    key_col: str = "doc_id",
    num_partitions: int | None = None,
    order_col: str = "shuffle_order",
) -> DataFrame:
    """Deterministic pseudo-random global training order.

    Pretraining wants every epoch's document order to be (a) uniform-
    random-looking, (b) exactly reproducible across reruns, engines,
    and input repartitionings — properties ``rand()`` + ``orderBy``
    cannot give. The order key is ``xxhash64(seed, key)``: change the
    seed, get an independent permutation; keep it, replay the epoch.

    Scale shape: ``repartitionByRange`` on the hash key plans a range
    exchange with SAMPLED boundaries (no single-partition sort — the
    100 TB trap of a bare ``orderBy`` window rank), then an in-
    partition sort that spills. Downstream writers that consume the
    partitions in index order see the full deterministic permutation;
    ties are impossible short of a 64-bit hash collision on the same
    key, and the key itself breaks those.
    """
    keyed = df.withColumn(
        order_col, F.xxhash64(F.lit(int(seed)), F.col(key_col))
    )
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return keyed.repartitionByRange(int(parts), order_col, key_col).sortWithinPartitions(
        order_col, key_col
    )


def pack_first_fit_decreasing(
    df: DataFrame,
    capacity: int,
    stream_cols: list[str] | None = None,
    doc_col: str = "doc_id",
    size_col: str = "n_tok",
) -> DataFrame:
    """No-split packing: assign each whole doc to exactly one bin of
    at most ``capacity`` tokens, minimizing padding — the SFT-style
    packing where an example must never span a boundary (unlike
    ``pack_chunks``' GPT-style concat-and-slice).

    Algorithm: first-fit-decreasing per stream (sort by size desc,
    ``doc_col`` asc tiebreak; place each doc in the lowest-indexed bin
    with room, else open a new one) — the classic 11/9·OPT + 6/9
    guarantee, fully deterministic. FFD is inherently sequential, so
    this is the documented pandas tier: ONE ``applyInPandas`` kernel
    per stream group, numpy residual array inside. Bound the group
    with the same sharding discipline as ``pack_chunks_sharded``
    (pass (source, shard) stream cols) — the kernel's memory is
    O(docs-in-stream) and its time O(docs × bins).

    Output: stream cols + (doc, size, ``bin_id``) — bin ids are
    0-based and dense per stream. Docs larger than ``capacity``
    RAISE (truncate upstream; silently dropping them would corrupt
    exactly-once accounting).
    """
    import pandas as pd

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    streams = list(stream_cols) if stream_cols else ["source"]

    # mirror the input's actual types (stream cols are often numeric
    # shard ids, not strings)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"`{c}` {types[c]}" for c in streams]
        + [f"`{doc_col}` {types[doc_col]}", f"`{size_col}` long", "bin_id long"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        sizes_all = pdf[size_col].to_numpy()
        over = sizes_all > capacity
        if over.any():
            bad = pdf[doc_col].to_numpy()[over][0]
            raise ValueError(
                f"doc {bad!r} has {int(sizes_all[over][0])} tokens > "
                f"capacity {capacity}; truncate before packing"
            )
        p = pdf.sort_values(
            [size_col, doc_col], ascending=[False, True], kind="mergesort"
        )
        sizes = p[size_col].to_numpy()
        residual = np.empty(len(p), dtype=np.int64)  # worst case: 1 bin/doc
        n_bins = 0
        bin_ids = np.empty(len(p), dtype=np.int64)
        for i, s in enumerate(sizes):
            fit = np.nonzero(residual[:n_bins] >= s)[0]
            if fit.size:
                b = int(fit[0])  # FIRST-fit among open bins
            else:
                b = n_bins
                residual[b] = capacity
                n_bins += 1
            residual[b] -= s
            bin_ids[i] = b
        out = p[streams + [doc_col]].copy()
        out[size_col] = sizes.astype("int64")
        out["bin_id"] = bin_ids
        return out

    return df.select(*streams, doc_col, size_col).groupBy(*streams).applyInPandas(
        kernel, out_schema
    )


# short alias; the pre-round-6 name `pack_best_fit` was a misnomer
# (the kernel is first-fit-decreasing, not best-fit) and was renamed
# while the API is new (ADVICE r5)
pack_ffd = pack_first_fit_decreasing


def packing_stats(
    packed: DataFrame,
    capacity: int,
    stream_cols: list[str] | None = None,
    size_col: str = "n_tok",
) -> DataFrame:
    """Per-stream fill accounting for a
    :func:`pack_first_fit_decreasing` result:
    n_bins, n_docs, token total, and fill = tokens / (n_bins * C)."""
    streams = list(stream_cols) if stream_cols else ["source"]
    return packed.groupBy(*streams).agg(
        (F.max("bin_id") + 1).alias("n_bins"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).alias("tokens"),
        (
            F.sum(size_col) / ((F.max("bin_id") + 1) * F.lit(float(capacity)))
        ).alias("fill"),
    )
