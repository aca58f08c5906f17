"""Write-side MERGE / upsert: keep the latest row per key as data
arrives — the reference's atomic checkpoint upsert
(src/watcher/watcher.rs:35-89: insert-or-update the FileState row for
an inode, atomically).

Two layers:

* ``latest_per_key`` — the pure merge semantic as a DataFrame op
  (window top-1 with total-order tiebreaks); used read-side and as the
  merge kernel.
* ``merge_upsert`` — applies a batch of updates to a keyed table
  through the TableCatalog seam. On parquet it is an emulated MERGE:
  read the CURRENT rows of only the key-hash partitions touched by the
  update batch, merge, and dynamically overwrite exactly those
  partitions — a transactional partition-scoped rewrite, never a full
  table rewrite. On Iceberg the same call maps to a real MERGE INTO
  (row-level deletes), which is strictly cheaper; the emulation keeps
  semantics identical.

Scale: the table is hash-partitioned on the key (``n_buckets``), so an
update batch touching k distinct keys rewrites at most min(k,
n_buckets) partitions, each read+written once. Update batches are
typically tiny relative to the table (checkpoint rows, dim updates) —
the classic upsert-into-big-table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ves_spark.sources.catalog import TableCatalog

BUCKET_COL = "_kb"


def latest_per_key(
    df: DataFrame, keys: list[str], order_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """One row per key: max order_col, ties broken by ``tiebreak``
    columns (then arbitrarily-but-deterministically by all remaining
    columns is the caller's duty — pass a total order)."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _bucketed(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    key_expr = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(key_expr), F.lit(n_buckets)).cast("int")
    )


def merge_upsert(
    spark: SparkSession,
    catalog: TableCatalog,
    name: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    n_buckets: int = 16,
    tiebreak: list[str] | None = None,
) -> None:
    """MERGE ``updates`` into table ``name``: new keys insert, existing
    keys keep the row with the greatest ``order_col`` (update wins ties
    via ``tiebreak``).

    Catalogs that expose a MERGE surface (IcebergCatalog's SQL
    ``MERGE INTO``, LocalSnapshotCatalog's snapshot-committed merge)
    get the delegated call; plain parquet gets the emulation below —
    identical semantics either way."""
    if hasattr(catalog, "merge_into"):
        catalog.merge_into(
            spark, name, updates, keys, order_col, n_buckets, tiebreak
        )
        return
    emulated_merge(spark, catalog, name, updates, keys, order_col, n_buckets, tiebreak)


def emulated_merge(
    spark: SparkSession,
    catalog: TableCatalog,
    name: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    n_buckets: int = 16,
    tiebreak: list[str] | None = None,
) -> None:
    """Partition-scoped MERGE emulation: read the CURRENT rows of only
    the key-hash buckets touched by the update batch, merge latest-per-
    key, dynamically overwrite exactly those buckets."""
    upd = _bucketed(updates, keys, n_buckets).withColumn("_upd", F.lit(1))
    touched = [int(r[BUCKET_COL]) for r in upd.select(BUCKET_COL).distinct().collect()]
    # Explicit first-write detection (NOT try/except around the read):
    # a failing read of an EXISTING table — permissions, corrupt
    # footer, schema drift in unionByName — must abort the MERGE, or
    # the dynamic overwrite below would replace the touched buckets
    # with update-only rows, silently destroying current data.
    if catalog.exists(spark, name):
        current = (
            catalog.read(spark, name)
            .filter(F.col(BUCKET_COL).isin(touched))
            .withColumn("_upd", F.lit(0))
        )
        merged_src = current.unionByName(upd)
    else:
        merged_src = upd
    # caller tiebreaks first (a unique tiebreak makes the result
    # engine-independent); _upd last so a FULL tie deterministically
    # goes to the update (MERGE's 'when matched' semantics)
    merged = latest_per_key(
        merged_src, keys, order_col, [*(tiebreak or []), "_upd"]
    ).drop("_upd")
    # Dynamic overwrite replaces exactly the touched bucket partitions;
    # untouched buckets are never read or written.
    catalog.overwrite_partitions(
        merged.repartition(max(len(touched), 1), BUCKET_COL),
        name,
        [BUCKET_COL],
    )


def read_table(spark: SparkSession, catalog: TableCatalog, name: str) -> DataFrame:
    """Read an upsert-maintained table without the bucket column."""
    return catalog.read(spark, name).drop(BUCKET_COL)
