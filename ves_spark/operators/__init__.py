"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing.

These extend the reference's ingest-core semantics (dedup-by-identity,
src/watcher/discovery.rs:33-35) to content-level identity at
100 TB training-data scale. All hot paths are built-in Spark SQL
expressions or Arrow-vectorized pandas UDFs — no per-row Python.
"""
