"""Table-format seam: ``Pipeline`` reads and writes its data tables
(routed, rollup_partial, and the scoped input reads) through this
catalog, so the storage format is swappable without touching stage
code (SURVEY.md §7.0, ADR invariant 5: 'storage-agnostic logic').
The LineageStore remains the commit manifest — the parquet-world
moral equivalent of Iceberg table metadata.

Two implementations:

* ``ParquetCatalog`` — plain parquet directories + the LineageStore
  manifest as the commit protocol. Always available; what tests and
  this sandbox use.
* ``IcebergCatalog`` — real Iceberg tables when the Spark runtime jar
  is on the classpath (`spark.sql.catalog...` configured). Snapshot
  ids become real snapshot ids, incremental reads use
  ``option("start-snapshot-id", ...)``, and the routed/rollup writes
  become atomic table commits. Constructing it without the jar raises
  ImportError-like RuntimeError — callers fall back to parquet.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class TableCatalog(ABC):
    @abstractmethod
    def exists(self, spark: SparkSession, name: str) -> bool:
        """Whether the table has ever been written. Callers (e.g.
        merge_upsert) use this for explicit first-write detection —
        a read failure on an EXISTING table must propagate, never be
        mistaken for 'table not there yet'."""

    @abstractmethod
    def read(self, spark: SparkSession, name: str) -> DataFrame: ...

    @abstractmethod
    def read_files(self, spark: SparkSession, paths: list[str]) -> DataFrame: ...

    @abstractmethod
    def append(self, df: DataFrame, name: str, partition_by: list[str]) -> None: ...

    @abstractmethod
    def overwrite_partitions(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str],
        options: dict | None = None,
    ) -> None:
        """Dynamic partition overwrite. ``options`` are writer options
        threaded to the physical write (e.g. ``maxRecordsPerFile`` for
        target-size output files — sources/sizing.py); values are
        stringified for the DataFrameWriter API."""

    def list_tables(self, spark: SparkSession, prefix: str = "") -> list[str]:
        """Names of existing tables starting with ``prefix``. Used by
        the streaming deliverer to find sink tables a redelivered
        micro-batch no longer routes to (their stale ``_batch_id``
        partition must be retracted). Default: none known."""
        return []

    @abstractmethod
    def delete_partitions(self, name: str, parts: list[dict]) -> None:
        """Drop whole partitions; each dict is an ordered prefix of the
        table's partition columns (e.g. {'batch_seq': 0, 'unit_id': 3}).
        Used for unit-scoped crash cleanup: orphaned output from an
        uncommitted increment is removed BEFORE rewriting, so recovery
        holds even if the sink set or route rules changed between the
        crashed run and the resume."""


class ParquetCatalog(TableCatalog):
    def __init__(self, root: str):
        self.root = root

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def exists(self, spark, name):
        import os

        return os.path.exists(self._path(name))

    def list_tables(self, spark, prefix=""):
        import os

        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if d.startswith(prefix)
            and not d.startswith((".", "_"))
            and os.path.isdir(os.path.join(self.root, d))
        )

    def read(self, spark, name):
        return spark.read.parquet(self._path(name))

    def read_files(self, spark, paths):
        return spark.read.parquet(*paths)

    def delete_partitions(self, name, parts):
        import shutil

        for spec in parts:
            sub = "/".join(f"{k}={v}" for k, v in spec.items())
            shutil.rmtree(f"{self._path(name)}/{sub}", ignore_errors=True)

    def append(self, df, name, partition_by=()):
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def overwrite_partitions(self, df, name, partition_by=(), options=None):
        # Per-write dynamic mode: only partitions present in ``df`` are
        # replaced. Set HERE, not via session conf — under Spark's
        # default ('static') an overwrite would silently DELETE every
        # partition not in the batch, so the operator must not depend
        # on the caller's session state for its contract.
        w = df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        opts = dict(options or {})
        # logical sizing key: the v1 parquet writer sizes files via the
        # maxRecordsPerFile rows cap computed from it upstream
        opts.pop("target_file_bytes", None)
        for k, v in opts.items():
            w = w.option(k, str(v))
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))


def newer_or_tie_predicate(order_cols: list[str]) -> str:
    """SQL predicate: source row ``s`` is lexicographically strictly
    newer than target row ``t`` over ``order_cols``, OR a full tie (a
    full tie goes to the update — MERGE 'when matched' semantics,
    matching emulated_merge's _upd-last tiebreak). Extracted so the
    logic is unit-testable without the Iceberg jar (the MERGE itself
    cannot run here; see ICEBERG.md)."""
    terms = [
        "("
        + " AND ".join(
            [f"s.{c} = t.{c}" for c in order_cols[:i]]
            + [f"s.{order_cols[i]} > t.{order_cols[i]}"]
        )
        + ")"
        for i in range(len(order_cols))
    ]
    terms.append("(" + " AND ".join(f"s.{c} = t.{c}" for c in order_cols) + ")")
    return " OR ".join(terms)


def _iceberg_available(spark: SparkSession, catalog_name: str) -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
        if not impl:
            return False
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergCatalog(TableCatalog):
    """Iceberg-backed tables (requires iceberg-spark-runtime jar)."""

    def __init__(self, spark: SparkSession, catalog_name: str = "ves"):
        if not _iceberg_available(spark, catalog_name):
            raise RuntimeError(
                "Iceberg Spark runtime not on classpath / catalog not "
                f"configured (spark.sql.catalog.{catalog_name}); use "
                "ParquetCatalog"
            )
        self.catalog = catalog_name

    def _tbl(self, name: str) -> str:
        return f"{self.catalog}.{name}"

    def exists(self, spark, name):
        return spark.catalog.tableExists(self._tbl(name))

    def list_tables(self, spark, prefix=""):
        rows = spark.sql(f"SHOW TABLES IN {self.catalog}").collect()
        return sorted(
            r["tableName"] for r in rows if r["tableName"].startswith(prefix)
        )

    def read(self, spark, name):
        return spark.read.format("iceberg").load(self._tbl(name))

    def read_files(self, spark, paths):
        # Iceberg inputs are addressed by snapshot, not file list —
        # discovery maps to read_incremental(start_snapshot_id); a raw
        # file-list read still works for foreign parquet inputs.
        return spark.read.parquet(*paths)

    def delete_partitions(self, name, parts):
        if not parts:
            return
        spark = SparkSession.getActiveSession()
        for spec in parts:
            where = " AND ".join(f"{k} = {v!r}" for k, v in spec.items())
            spark.sql(f"DELETE FROM {self._tbl(name)} WHERE {where}")

    def read_incremental(
        self, spark, name: str, start_snapshot_id: int, end_snapshot_id: int | None = None
    ):
        r = spark.read.format("iceberg").option(
            "start-snapshot-id", str(start_snapshot_id)
        )
        if end_snapshot_id is not None:
            r = r.option("end-snapshot-id", str(end_snapshot_id))
        return r.load(self._tbl(name))

    def append(self, df, name, partition_by=()):
        df.writeTo(self._tbl(name)).append()

    def overwrite_partitions(self, df, name, partition_by=(), options=None):
        wt = df.writeTo(self._tbl(name))
        opts = dict(options or {})
        # Translate the logical sizing keys: Iceberg's DSv2 writer
        # sizes files via its own target-file-size-bytes write option
        # and silently IGNORES the v1 maxRecordsPerFile knob — forward
        # the byte target under the name Iceberg understands so
        # --target-file-bytes is not a no-op on this catalog.
        opts.pop("maxRecordsPerFile", None)
        tfb = opts.pop("target_file_bytes", None)
        if tfb:
            wt = wt.option("target-file-size-bytes", str(int(tfb)))
        for k, v in opts.items():
            wt = wt.option(k, str(v))
        wt.overwritePartitions()

    def current_snapshot_id(self, name: str) -> int | None:
        spark = SparkSession.getActiveSession()
        rows = spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(name)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    def merge_into(
        self,
        spark,
        name: str,
        updates: DataFrame,
        keys: list[str],
        order_col: str,
        n_buckets: int = 16,
        tiebreak: list[str] | None = None,
    ) -> None:
        """Real row-level MERGE INTO. Updates are pre-deduped to one
        row per key (MERGE requires a unique source match), keeping
        the row with the greatest (order_col, tiebreak...)."""
        from ves_spark.operators.upsert import latest_per_key

        if not self.exists(spark, name):
            updates.writeTo(self._tbl(name)).create()
            return
        view = f"_merge_src_{name.replace('.', '_')}"
        latest_per_key(updates, keys, order_col, tiebreak).createOrReplaceTempView(
            view
        )
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        newer = newer_or_tie_predicate([order_col, *(tiebreak or [])])
        spark.sql(
            f"MERGE INTO {self._tbl(name)} t USING {view} s ON {on} "
            f"WHEN MATCHED AND ({newer}) THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )


def get_catalog(
    spark: SparkSession,
    root: str,
    prefer_iceberg: bool = True,
    impl: str | None = None,
) -> TableCatalog:
    """impl: 'parquet' | 'snapshot' (Iceberg contract double, see
    ICEBERG.md) | 'iceberg' (requires the runtime jar) | 'auto'
    (iceberg if available, else parquet — legacy prefer_iceberg)."""
    if impl is None:
        impl = "auto" if prefer_iceberg else "parquet"
    if impl == "parquet":
        return ParquetCatalog(root)
    if impl == "snapshot":
        from ves_spark.sources.snapshot_catalog import LocalSnapshotCatalog

        return LocalSnapshotCatalog(root)
    if impl == "iceberg":
        return IcebergCatalog(spark)
    if impl == "auto":
        try:
            return IcebergCatalog(spark)
        except RuntimeError:
            return ParquetCatalog(root)
    raise ValueError(f"unknown catalog impl: {impl!r}")
