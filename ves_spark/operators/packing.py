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

Scale shape (100 TB): one window per stream. Production streams are
(source, shard) with shard = a doc_id hash bucket sized so each
stream's token count fits a task — packing is inherently sequential
PER STREAM, so parallelism comes from stream count, not intra-stream
splitting. Skewed sources get more shards, not salting (order must
stay deterministic inside a stream).
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
    out = sized.withColumn("tok_start", prefix)
    return (
        out.withColumn(
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
