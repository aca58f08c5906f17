"""Write-side MERGE/upsert semantics (reference checkpoint upsert,
src/watcher/watcher.rs:35-89): latest-per-key state, batch
composition, idempotent re-apply, partition-scoped rewrites."""

import pytest

from pyspark.sql import functions as F

from ves_spark.operators.upsert import BUCKET_COL, merge_upsert, read_table
from ves_spark.sources.catalog import ParquetCatalog


@pytest.fixture()
def cat(tmp_path):
    return ParquetCatalog(str(tmp_path))


def _state(spark, cat):
    return {
        (r["k"], r["v"], r["o"])
        for r in read_table(spark, cat, "t").collect()
    }


def test_merge_upsert_latest_wins(spark, cat):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    b1 = spark.createDataFrame([("a", 1, 10), ("b", 2, 10)], "k string, v int, o int")
    b2 = spark.createDataFrame(
        [("a", 9, 20), ("c", 3, 5)], "k string, v int, o int"
    )
    merge_upsert(spark, cat, "t", b1, ["k"], "o")
    merge_upsert(spark, cat, "t", b2, ["k"], "o")
    # a updated (newer o), b untouched, c inserted
    assert _state(spark, cat) == {("a", 9, 20), ("b", 2, 10), ("c", 3, 5)}

    # stale update (older o) loses; equal o goes to the update
    b3 = spark.createDataFrame([("a", 0, 15), ("b", 7, 10)], "k string, v int, o int")
    merge_upsert(spark, cat, "t", b3, ["k"], "o")
    assert _state(spark, cat) == {("a", 9, 20), ("b", 7, 10), ("c", 3, 5)}

    # idempotent re-apply
    merge_upsert(spark, cat, "t", b3, ["k"], "o")
    assert _state(spark, cat) == {("a", 9, 20), ("b", 7, 10), ("c", 3, 5)}


def test_merge_upsert_partition_scoped(spark, cat):
    """Buckets untouched by the update batch keep their files: the
    rewrite is partition-scoped, not a full-table rewrite."""
    import os

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    base = spark.range(200).select(
        F.col("id").cast("string").alias("k"),
        F.col("id").cast("int").alias("v"),
        F.lit(1).alias("o"),
    )
    merge_upsert(spark, cat, "t", base, ["k"], "o", n_buckets=8)
    before = {
        d: sorted(os.listdir(os.path.join(str(cat.root), "t", d)))
        for d in os.listdir(os.path.join(str(cat.root), "t"))
        if d.startswith(BUCKET_COL)
    }
    upd = spark.createDataFrame([("7", 99, 2)], "k string, v int, o int")
    merge_upsert(spark, cat, "t", upd, ["k"], "o", n_buckets=8)
    after = {
        d: sorted(os.listdir(os.path.join(str(cat.root), "t", d)))
        for d in os.listdir(os.path.join(str(cat.root), "t"))
        if d.startswith(BUCKET_COL)
    }
    changed = [d for d in before if before[d] != after[d]]
    assert len(changed) == 1  # exactly the touched bucket rewritten
    got = {(r["k"], r["v"]) for r in read_table(spark, cat, "t").collect()}
    assert ("7", 99) in got and len(got) == 200


def test_merge_upsert_read_failure_raises(spark, cat):
    """A failing read of an EXISTING table must abort the MERGE —
    never degrade to insert-only (which would replace the touched
    buckets with update-only rows)."""
    b1 = spark.createDataFrame([("a", 1, 10)], "k string, v int, o int")
    merge_upsert(spark, cat, "t", b1, ["k"], "o")

    class FailingReadCatalog(ParquetCatalog):
        def read(self, spark, name):
            raise IOError("injected: corrupt footer")

    bad = FailingReadCatalog(str(cat.root))
    b2 = spark.createDataFrame([("a", 9, 20)], "k string, v int, o int")
    with pytest.raises(IOError, match="injected"):
        merge_upsert(spark, bad, "t", b2, ["k"], "o")
    # table unchanged
    assert _state(spark, cat) == {("a", 1, 10)}


def test_merge_upsert_independent_of_session_overwrite_mode(spark, cat):
    """The partition-scoped contract must hold under Spark's DEFAULT
    session conf (partitionOverwriteMode=static): dynamic mode is set
    per-write inside the catalog, so untouched buckets survive."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        base = spark.range(100).select(
            F.col("id").cast("string").alias("k"),
            F.col("id").cast("int").alias("v"),
            F.lit(1).alias("o"),
        )
        merge_upsert(spark, cat, "t", base, ["k"], "o", n_buckets=8)
        upd = spark.createDataFrame([("7", 99, 2)], "k string, v int, o int")
        merge_upsert(spark, cat, "t", upd, ["k"], "o", n_buckets=8)
        got = {(r["k"], r["v"]) for r in read_table(spark, cat, "t").collect()}
        assert ("7", 99) in got
        assert len(got) == 100  # every key not in the update batch survived
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
