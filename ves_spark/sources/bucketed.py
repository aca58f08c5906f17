"""Bucketed table writes: the north_star's "bucketed writes on
doc_id" as real Spark bucketing, not just a repartition-before-write.

A table written with ``bucketBy(n, key) + sortBy(key)`` records its
layout in the catalog; any equi-join or aggregation on the bucket key
between tables with the same bucket count then runs WITHOUT an
exchange on either side — the shuffle was paid once at write time and
is reused by every subsequent join (co-located joins, the
pre-partitioning strategy the 100 TB design calls for: routed and
checkpoint tables share doc_id bucketing, so resume anti-joins and
dedup probes never reshuffle the big side; plan-asserted in
tests/test_plans.py::test_bucketed_join_no_exchange).

On the parquet-directory catalog the ``Pipeline`` uses
``repartition(n, doc_id)`` instead (one output file per bucket,
layout identical) because plain ``.parquet(path)`` writes cannot
record bucket metadata — only table-catalog writes can. This module
is the table-catalog path; with Iceberg the same declaration is the
``bucket(n, doc_id)`` partition transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str = "doc_id",
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted external table at ``path``."""
    (
        df.write.option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode(mode)
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog,
    so joins on the bucket key skip the exchange)."""
    return spark.table(name)
