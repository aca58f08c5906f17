"""Enrich stage: broadcast-hash lookup join against the source dim.

The reference keys all per-source state by stable identity
(``Checkpoint: HashMap<Inode, FileState>``, reference
src/watcher/models.rs:56-58); the rebuild's analogue is a lookup dim
keyed by ``source``. The dim is tiny (~16 rows here, thousands at
most in production) so the join MUST be a broadcast hash join — at
100 TB a shuffle join on ``source`` would both shuffle the full fact
table and collapse onto ~16 keys (extreme skew). ``F.broadcast``
makes that explicit rather than trusting the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNKNOWN_TENANT = "unknown_tenant"
UNKNOWN_ENV = "unknown"
DEFAULT_PRIORITY = 0


def enrich(df: DataFrame, source_meta: DataFrame) -> DataFrame:
    """Left broadcast join + defaults for uncovered sources.

    A source absent from the dim (the reference analogue: a payload
    whose inode has no checkpoint entry) gets ``unknown_tenant`` /
    priority 0 instead of being dropped.
    """
    dim = source_meta.select("source", "tenant", "env", "priority")
    out = df.join(F.broadcast(dim), "source", "left")
    return (
        out.withColumn("tenant", F.coalesce(F.col("tenant"), F.lit(UNKNOWN_TENANT)))
        .withColumn("env", F.coalesce(F.col("env"), F.lit(UNKNOWN_ENV)))
        .withColumn("priority", F.coalesce(F.col("priority"), F.lit(DEFAULT_PRIORITY)))
    )
