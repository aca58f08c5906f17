"""Canonical schemas for the pipeline.

Input shape is mandated by BASELINE.json ``input_hint``:
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)``.
It is the Spark analogue of the reference's ``TailerPayload
{raw_data: Bytes, size: usize}`` (reference
components/core-agent/src/tailer/models.rs:79-82): ``tokens`` is the
payload, ``n_tok`` the size-for-metrics field
(src/tailer/payload.rs:12-13), ``doc_id`` the stable identity the
reference keys by inode (src/watcher/models.rs:11), ``source`` the
originating stream.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- input
SEQUENCES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# Vocabulary size for synthetic tokens (GPT-2-ish, keeps values < 2^31).
VOCAB = 50_257

# ------------------------------------------------------- parse contract
# FIXTURES.md §A: the first tokens encode parseable fields; the rest is
# payload that must survive byte-for-byte (token-array equality).
LEVELS = ["TRACE", "DEBUG", "INFO", "NOTICE", "WARN", "ERROR", "CRITICAL", "FATAL"]
BASE_EPOCH = 1_735_689_600  # 2025-01-01T00:00:00Z

PARSED_FIELDS = T.StructType(
    [
        T.StructField("level_id", T.IntegerType(), False),
        T.StructField("ts_minute", T.IntegerType(), False),
        T.StructField("status_code", T.IntegerType(), False),
    ]
)

# ------------------------------------------------------------ dimensions
SOURCE_META = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("tenant", T.StringType(), False),
        T.StructField("env", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

ROUTE_RULES = T.StructType(
    [
        T.StructField("rule_id", T.IntegerType(), False),
        T.StructField("predicate", T.StringType(), False),  # Spark SQL boolean expr
        T.StructField("sink", T.StringType(), False),
    ]
)

DEFAULT_SINK = "sink_default"

# ----------------------------------------------------- checkpoint/lineage
# FIXTURES.md §D — the Spark analogue of the reference's
# Checkpoint{files: HashMap<Inode, FileState>} (src/watcher/models.rs:56-58)
# plus the ADR write-ahead invariants (ADR/Watcher/000x-checkpoint-store.md:27-33).
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("unit_id", T.IntegerType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("rows", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)
