"""ves_spark — a PySpark-native parse → enrich → route → aggregate
log/telemetry analytics engine.

A from-scratch rebuild (NOT a port) of the capabilities of the
H3IMD3LL-Labs-Inc/VES observability ingest core, re-expressed as an
idiomatic Spark DataFrame pipeline over tables of pre-tokenized
training sequences:

    read (Iceberg/parquet, incremental)            # reference: watcher/discovery
      -> parse   (Arrow-vectorized, zero per-row Python)   # tailer normalization TODO
      -> enrich  (broadcast-hash lookup join)
      -> route   (rule table -> multi-sink fan-out)        # tailer_events translation
      -> aggregate (count/sum/percentile rollups, salt-aware)
      -> checkpoint/lineage commit (exactly-once resume)   # watcher Checkpoint + ADR

Reference behaviors preserved (see SURVEY.md for file:line citations
into /root/reference): checkpoint-before-advance, dedup-by-identity
(anti-join), rotation-style multi-sink fan-out, bounded per-increment
processing, per-payload size metrics.
"""

__version__ = "0.1.0"
