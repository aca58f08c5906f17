"""Compression-ratio quality filter: deflate ratio of a document as a
repetitiveness/boilerplate signal (the Gopher/CCNet-family "compression
quality cut": machine-generated or template text compresses far below
natural prose, near-random payloads compress above it).

Tier honesty (the custom-operator ladder): there is no Catalyst
expression or JVM built-in that deflate-compresses a column, so this
is the documented pandas-UDF tier — ONE Arrow-batched kernel, never a
row-at-a-time Python UDF. The per-row ``zlib.compress`` call inside
the batch is irreducible (the codec is the computation), like the
media decoders in operators/multimodal.py.

100 TB shape: map-only, rides the scan, zero shuffle; zlib level 6
sustains ~100 MB/s/core, so the stage is compute-bound but
embarrassingly parallel — executors scale it linearly, and the Arrow
transfer is one columnar batch each way. The ratio itself is computed
JVM-side from the two integer byte counts the kernel returns, so
filter predicates on it stay in codegen.

Determinism: zlib with a pinned level is deterministic for a given
zlib build; tests replay the exact byte counts with direct
``zlib.compress`` calls.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STRUCT = "raw_bytes: long, comp_bytes: long"


def _kernel(mode: str, level: int):
    import zlib

    import numpy as np

    if mode == "text":

        def to_bytes(v) -> bytes:
            return (v or "").encode("utf-8")

    elif mode == "tokens":

        def to_bytes(v) -> bytes:
            # little-endian int32 view: the token array's natural wire
            # bytes, matching the pipeline's 4-bytes/token accounting
            return np.asarray(v, dtype="<i4").tobytes() if v is not None else b""

    else:
        raise ValueError(f"mode must be 'text' or 'tokens', got {mode!r}")

    def compress_batch(s: pd.Series) -> pd.DataFrame:
        raw, comp = [], []
        for v in s:
            b = to_bytes(v)
            raw.append(len(b))
            comp.append(len(zlib.compress(b, level)))
        return pd.DataFrame({"raw_bytes": raw, "comp_bytes": comp})

    return compress_batch


def deflate_features(
    df: DataFrame,
    col: str,
    mode: str = "text",
    level: int = 6,
) -> DataFrame:
    """Add ``raw_bytes``, ``comp_bytes``, ``deflate_ratio`` for the
    given text (utf-8 bytes) or token-array (int32 wire bytes) column.
    ``deflate_ratio`` is null for empty payloads — a 0-byte doc has no
    meaningful ratio and must not masquerade as ultra-repetitive."""
    if level < 1 or level > 9:
        raise ValueError(f"zlib level must be 1..9, got {level}")
    kernel = _kernel(mode, level)  # validates mode eagerly
    udf = F.pandas_udf(kernel, _STRUCT)
    out = df.withColumn("_z", udf(F.col(col)))
    return (
        out.withColumn("raw_bytes", F.col("_z.raw_bytes"))
        .withColumn("comp_bytes", F.col("_z.comp_bytes"))
        .withColumn(
            "deflate_ratio",
            F.when(
                F.col("raw_bytes") > 0,
                F.col("comp_bytes").cast("double") / F.col("raw_bytes"),
            ),
        )
        .drop("_z")
    )


def repetitive_docs(
    df: DataFrame,
    col: str,
    mode: str = "text",
    max_ratio: float = 0.30,
    level: int = 6,
) -> DataFrame:
    """Docs whose deflate ratio falls AT OR BELOW ``max_ratio`` —
    the repetitive/boilerplate cut (natural prose sits ~0.35-0.6;
    templated or looped text well below). Empty docs (null ratio) are
    excluded: no evidence either way."""
    return deflate_features(df, col, mode=mode, level=level).where(
        F.col("deflate_ratio") <= max_ratio
    )
