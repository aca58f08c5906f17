"""Parse stage: raw token payload → structured fields.

The reference leaves normalization as a TODO downstream of the tailer
("Use output_rx in the next stage of the normalization stage",
reference src/tailer/manager.rs:28-29) but declares the intent via its
``regex``/``chrono``/``serde_json`` deps (Cargo.toml:37-40). Here the
payload is a token array (BASELINE.json input_hint) and the parse
contract is FIXTURES.md §A:

    tokens[0] % 8            -> level_id / level
    tokens[1]                -> minutes since BASE_EPOCH -> ts, time_bucket
    tokens[2]                -> status_class (1..5) + status_code

Everything after tokens[2] is opaque payload and must survive
unchanged (token-array equality invariant).

Two interchangeable implementations, equality-tested against each
other and the pandas refimpl:

* ``parse_builtin`` — pure JVM column expressions (whole-stage
  codegen, the hot-path default).
* ``parse_arrow``   — an Arrow-vectorized ``pandas_udf`` over the
  token arrays (the mandated grok-style UDF kernel; zero per-row
  Python — operates on whole Arrow batches via zero-copy numpy).

At 100 TB the builtin path wins: it never leaves the JVM, keeps the
scan → parse → enrich span inside one WholeStageCodegen, and lets
Catalyst prune ``tokens`` out of the scan for queries that only need
the parsed fields.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ves_spark.schema import BASE_EPOCH, LEVELS, PARSED_FIELDS

TIME_BUCKET_MINUTES = 5


def _finish(df: DataFrame) -> DataFrame:
    """Derive the human columns from the three raw parsed ints."""
    level_array = F.array(*[F.lit(x) for x in LEVELS])
    return (
        df.withColumn("level", F.element_at(level_array, F.col("level_id") + 1))
        .withColumn(
            "ts",
            F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("ts_minute").cast("long") * 60),
        )
        .withColumn(
            "time_bucket",
            F.timestamp_seconds(
                F.lit(BASE_EPOCH)
                + (F.col("ts_minute").cast("long") / TIME_BUCKET_MINUTES).cast("long")
                * (TIME_BUCKET_MINUTES * 60)
            ),
        )
        .withColumn("status_class", F.floor(F.col("status_code") / 100).cast("int"))
    )


#: shared contract-violation message — both impls raise with this text
_CONTRACT_MSG = "parse contract: every sequence needs >= 3 tokens"


def _contract_guard():
    """Zero-on-success column that raises on a <3-token sequence —
    the same loud failure ``parse_arrow`` gives, so the two impls
    behave identically on malformed input (a NULL-propagating
    ``element_at`` would otherwise let a bad row flow through with
    NULL level/ts only on the builtin path). assert_true yields NULL
    on success; coalesce folds it into each derived column so the
    check survives Catalyst pruning of any column subset (the
    ``lane_guard`` pattern, operators/dedup.py)."""
    return F.coalesce(
        F.assert_true(F.size("tokens") >= 3, F.lit(_CONTRACT_MSG)).cast("int"),
        F.lit(0),
    )


def parse_builtin(df: DataFrame) -> DataFrame:
    """JVM-only parse: element_at + arithmetic, fully codegen'd.
    The guard is the LEFT operand of each sum: codegen evaluates
    children left-to-right, so the contract message fires before an
    ANSI-mode element_at can throw its own INVALID_ARRAY_INDEX on a
    too-short array — identical error text to parse_arrow on every
    malformed shape, including tokens = []."""
    t = lambda i: F.element_at(F.col("tokens"), i)  # 1-based  # noqa: E731
    g = _contract_guard()
    raw = (
        df.withColumn("level_id", g + t(1) % 8)
        .withColumn("ts_minute", g + t(2))
        .withColumn(
            "status_code",
            (g + (t(3) % 5 + 1) * 100 + t(3) % 100).cast("int"),
        )
    )
    return _finish(raw)


def _parse_kernel_fn(tokens: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized parse kernel. ``tokens`` arrives as a Series of
    numpy int32 arrays; all math is numpy-vectorized per batch — the
    head gather is one concatenate + fancy-index, zero per-row Python
    (np.concatenate over the Series' array list is a single C pass)."""
    import numpy as np

    arrs = tokens.to_numpy()
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    flat = (
        np.concatenate(arrs) if len(arrs) else np.empty(0, dtype=np.int64)
    ).astype(np.int64, copy=False)
    if len(lens) and lens.min() < 3:
        raise ValueError(_CONTRACT_MSG)
    starts = np.cumsum(lens) - lens
    head = flat[starts[:, None] + np.arange(3)]
    level_id = (head[:, 0] % 8).astype(np.int32)
    ts_minute = head[:, 1].astype(np.int32)
    status_code = ((head[:, 2] % 5 + 1) * 100 + head[:, 2] % 100).astype(np.int32)
    return pd.DataFrame(
        {"level_id": level_id, "ts_minute": ts_minute, "status_code": status_code}
    )


def parse_arrow(df: DataFrame) -> DataFrame:
    """pandas_udf parse: one Arrow batch in, one struct column out."""
    kernel = F.pandas_udf(_parse_kernel_fn, PARSED_FIELDS)
    parsed = df.withColumn("_p", kernel(F.col("tokens")))
    raw = parsed.select("*", "_p.level_id", "_p.ts_minute", "_p.status_code").drop("_p")
    return _finish(raw)


def parse(df: DataFrame, impl: str = "builtin") -> DataFrame:
    return parse_builtin(df) if impl == "builtin" else parse_arrow(df)


def bytes_col() -> Column:
    """Payload size metric — analogue of TailerPayload.size
    (reference src/tailer/payload.rs:12-13): n_tok int32 tokens."""
    return (F.col("n_tok").cast("long") * 4).alias("bytes")
