"""Contract-level test double of the Iceberg table format (see
ICEBERG.md: the runtime jar is unobtainable in this sandbox, so the
snapshot semantics the pipeline depends on — reference ADR/Watcher/
000x-checkpoint-store.md:19-33 — are exercised against this local
implementation of the same surface).

Table layout under ``<root>/<name>/``::

    data/s<snapshot>-<uuid>/<partition dirs>/part-*.parquet
    meta/v<NNNN>.json    # complete table state, atomic rename commit

Every write operation commits a NEW snapshot: data files are immutable
once written (a crash between the data write and the metadata rename
leaves an invisible orphan dir — snapshot isolation), the metadata
version file is the commit point, and readers resolve the latest
committed version's live (partition-spec -> data dir) map. This is the
moral core of Iceberg's metadata.json + manifest protocol, minus
manifests (file-level tracking is collapsed to partition-spec level —
sufficient for the pipeline's partition-scoped operations).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from ves_spark.sources.catalog import TableCatalog


class LocalSnapshotCatalog(TableCatalog):
    def __init__(self, root: str):
        self.root = root

    # ------------------------------------------------------- metadata
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_dir(self, name: str) -> str:
        return os.path.join(self._tdir(name), "meta")

    def _load_meta(self, name: str) -> dict | None:
        md = self._meta_dir(name)
        if not os.path.isdir(md):
            return None
        versions = sorted(
            f for f in os.listdir(md) if f.startswith("v") and f.endswith(".json")
        )
        if not versions:
            return None
        with open(os.path.join(md, versions[-1])) as fh:
            return json.load(fh)

    def _commit_meta(self, name: str, meta: dict) -> None:
        """Atomic metadata commit: tmp -> fsync -> rename to the next
        version file. The rename IS the snapshot commit point."""
        md = self._meta_dir(name)
        os.makedirs(md, exist_ok=True)
        version = meta["version"]
        tmp = os.path.join(md, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.rename(tmp, os.path.join(md, f"v{version:08d}.json"))
        dfd = os.open(md, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _next_meta(self, name: str) -> dict:
        meta = self._load_meta(name)
        if meta is None:
            meta = {"version": 0, "current_snapshot_id": 0, "snapshots": [], "live": {}}
        return {
            "version": meta["version"] + 1,
            "current_snapshot_id": meta["current_snapshot_id"] + 1,
            "snapshots": list(meta["snapshots"]),
            "live": {k: list(v) for k, v in meta["live"].items()},
            # smallest snapshot id whose history entry is still
            # retained; ids below it were expired (see expire_snapshots)
            "expired_below": meta.get("expired_below", 1),
        }

    # ------------------------------------------------------ data write
    def _write_snapshot_dir(
        self, df: DataFrame, name: str, partition_by, snap_id: int, options=None
    ) -> tuple[str, list[str]]:
        """Write df into a fresh immutable data dir; returns (dir name,
        partition specs present in the written data)."""
        dname = f"s{snap_id}-{uuid.uuid4().hex[:8]}"
        full = os.path.join(self._tdir(name), "data", dname)
        w = df.write.mode("error")
        opts = dict(options or {})
        # logical sizing key: this v1 parquet path sizes files via the
        # maxRecordsPerFile rows cap computed from it upstream
        opts.pop("target_file_bytes", None)
        for k, v in opts.items():
            w = w.option(k, str(v))
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(full)
        specs = []
        for dirpath, _dirs, files in os.walk(full):
            if any(f.endswith(".parquet") for f in files):
                rel = os.path.relpath(dirpath, full)
                specs.append("" if rel == "." else rel)
        return dname, sorted(specs)

    def _commit_write(
        self, df: DataFrame, name: str, partition_by, op: str, options=None
    ) -> None:
        meta = self._next_meta(name)
        snap_id = meta["current_snapshot_id"]
        dname, specs = self._write_snapshot_dir(
            df, name, partition_by, snap_id, options
        )
        live = meta["live"]
        for spec in specs:
            entry = [dname, spec, snap_id]
            if op == "overwrite":
                live[spec] = [entry]  # dynamic overwrite: replace the spec
            else:
                live.setdefault(spec, []).append(entry)
        meta["snapshots"].append(
            {"id": snap_id, "op": op, "dir": dname, "specs": specs}
        )
        self._commit_meta(name, meta)

    # ------------------------------------------------------- interface
    def exists(self, spark, name):
        return self._load_meta(name) is not None

    def list_tables(self, spark, prefix=""):
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if d.startswith(prefix) and self._load_meta(d) is not None
        )

    def append(self, df, name, partition_by=()):
        self._commit_write(df, name, partition_by, "append")

    def overwrite_partitions(self, df, name, partition_by=(), options=None):
        self._commit_write(df, name, partition_by, "overwrite", options)

    def delete_partitions(self, name, parts):
        if not parts or self._load_meta(name) is None:
            return  # nothing to delete; don't materialize an empty table
        meta = self._next_meta(name)
        prefixes = ["/".join(f"{k}={v}" for k, v in spec.items()) for spec in parts]
        live = meta["live"]
        dead = [
            s
            for s in live
            if any(s == p or s.startswith(p + "/") for p in prefixes)
        ]
        if not dead:
            return  # no-op delete: don't burn a snapshot (keeps
            # append-only ranges incremental-readable)
        for s in dead:
            del live[s]
        meta["snapshots"].append(
            {
                "id": meta["current_snapshot_id"],
                "op": "delete",
                "dir": None,
                "specs": dead,
            }
        )
        self._commit_meta(name, meta)

    # -------------------------------------------------------- reading
    def _read_entries(self, spark: SparkSession, name: str, entries) -> DataFrame:
        """Union-read (dir, spec) leaves, grouped per data dir so
        basePath recovers the partition columns from the dir names."""
        by_dir: dict[str, list[str]] = {}
        for dname, spec, _sid in entries:
            by_dir.setdefault(dname, []).append(spec)
        parts = []
        for dname, specs in sorted(by_dir.items()):
            base = os.path.join(self._tdir(name), "data", dname)
            leaves = [os.path.join(base, s) if s else base for s in sorted(specs)]
            parts.append(
                spark.read.option("basePath", base).parquet(*leaves)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, spark, name):
        meta = self._load_meta(name)
        if meta is None:
            raise FileNotFoundError(f"snapshot table does not exist: {name}")
        entries = [e for v in meta["live"].values() for e in v]
        if not entries:
            raise FileNotFoundError(f"snapshot table is empty: {name}")
        return self._read_entries(spark, name, entries)

    def read_files(self, spark, paths):
        # raw file-list read for foreign parquet inputs (same as the
        # real IcebergCatalog: discovery of non-table inputs stays a
        # plain parquet scan)
        return spark.read.parquet(*paths)

    def read_incremental(
        self,
        spark,
        name: str,
        start_snapshot_id: int,
        end_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Rows added by append snapshots in (start, end]. Like
        Iceberg's incremental read, only append-only ranges are
        supported — an overwrite/delete in range raises."""
        meta = self._load_meta(name)
        if meta is None:
            raise FileNotFoundError(f"snapshot table does not exist: {name}")
        end = end_snapshot_id if end_snapshot_id is not None else meta[
            "current_snapshot_id"
        ]
        # an expired snapshot inside (start, end] would make the read
        # silently PARTIAL — refuse loudly instead (Iceberg raises the
        # same way when a range crosses expired snapshots)
        expired_below = meta.get("expired_below", 1)
        if start_snapshot_id < expired_below - 1:
            raise ValueError(
                f"incremental read from snapshot {start_snapshot_id} "
                f"crosses expired history (snapshots below "
                f"{expired_below} were expired); re-read the full table"
            )
        in_range = [
            s for s in meta["snapshots"] if start_snapshot_id < s["id"] <= end
        ]
        bad = [s["id"] for s in in_range if s["op"] != "append"]
        if bad:
            raise ValueError(
                f"incremental read over non-append snapshots {bad} "
                "is not supported (Iceberg has the same restriction)"
            )
        entries = [
            (s["dir"], spec, s["id"]) for s in in_range for spec in s["specs"]
        ]
        if not entries:
            return self.read(spark, name).limit(0)
        return self._read_entries(spark, name, entries)

    # ------------------------------------------------- iceberg surface
    def current_snapshot_id(self, name: str) -> int | None:
        meta = self._load_meta(name)
        return None if meta is None else meta["current_snapshot_id"]

    def merge_into(
        self,
        spark: SparkSession,
        name: str,
        updates: DataFrame,
        keys: list[str],
        order_col: str,
        n_buckets: int = 16,
        tiebreak: list[str] | None = None,
    ) -> None:
        """The MERGE INTO surface: latest-per-key upsert committed as a
        partition-scoped overwrite snapshot. On the real IcebergCatalog
        this is a SQL MERGE; semantics identical."""
        from ves_spark.operators.upsert import emulated_merge

        emulated_merge(
            spark, self, name, updates, keys, order_col, n_buckets, tiebreak
        )

    # --------------------------------------------------- maintenance
    def expire_snapshots(
        self,
        name: str,
        keep_last: int = 10,
        orphan_age_s: float = 3600.0,
        max_meta_versions: int = 10,
    ) -> dict:
        """Iceberg ``expire_snapshots`` + ``remove_orphan_files``:
        reclaim the data dirs that partition-overwrite / retire churn
        strands, without touching current-state readability.

        Retains the last ``keep_last`` snapshot HISTORY entries plus
        every data dir the ``live`` map still references (an old
        append whose spec was never overwritten stays readable even
        after its history entry expires). Commit-then-clean: the
        pruned metadata version is renamed into place FIRST, then
        unreferenced dirs are deleted — a crash in between leaves
        orphans that the next call re-collects (idempotent).
        Incremental reads that would cross the expired range raise in
        ``read_incremental`` via the committed ``expired_below``
        fence; ``current_snapshot_id`` never changes (maintenance is
        not a new snapshot, exactly like Iceberg)."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (the current snapshot is always retained)")
        meta = self._load_meta(name)
        if meta is None:
            raise FileNotFoundError(f"snapshot table does not exist: {name}")
        snaps = meta["snapshots"]
        retained, expired = snaps[-keep_last:], snaps[:-keep_last]
        if expired:
            new_meta = {
                "version": meta["version"] + 1,
                "current_snapshot_id": meta["current_snapshot_id"],
                "snapshots": retained,
                "live": meta["live"],
                "expired_below": retained[0]["id"]
                if retained
                else meta["current_snapshot_id"] + 1,
            }
            self._commit_meta(name, new_meta)
            meta = new_meta
        removed = self.remove_orphan_files(name, orphan_age_s=orphan_age_s)
        pruned_meta = self._prune_meta_versions(name, max_meta_versions)
        return {
            "expired_snapshots": len(expired),
            "removed_dirs": removed,
            "pruned_meta_versions": pruned_meta,
        }

    def remove_orphan_files(self, name: str, orphan_age_s: float = 3600.0) -> list[str]:
        """Delete data dirs referenced by neither the live map nor any
        retained snapshot entry. ``orphan_age_s`` guards the inherent
        race with an in-flight writer whose dir is not yet committed
        (Iceberg's remove_orphan_files has the same age threshold):
        only dirs older than the threshold are swept."""
        import shutil
        import time

        meta = self._load_meta(name)
        if meta is None:
            raise FileNotFoundError(f"snapshot table does not exist: {name}")
        referenced = {e[0] for v in meta["live"].values() for e in v} | {
            s["dir"] for s in meta["snapshots"] if s["dir"]
        }
        data_root = os.path.join(self._tdir(name), "data")
        if not os.path.isdir(data_root):
            return []
        removed = []
        now = time.time()
        for d in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, d)
            if d in referenced or not os.path.isdir(full):
                continue
            if now - os.path.getmtime(full) < orphan_age_s:
                continue  # possibly an in-flight uncommitted write
            shutil.rmtree(full)
            removed.append(d)
        return removed

    def _prune_meta_versions(self, name: str, max_versions: int) -> int:
        """Keep only the newest ``max_versions`` metadata files (the
        loader reads the latest; older files exist for debugging)."""
        md = self._meta_dir(name)
        versions = sorted(
            f for f in os.listdir(md) if f.startswith("v") and f.endswith(".json")
        )
        stale = versions[:-max_versions] if max_versions > 0 else []
        for f in stale:
            os.remove(os.path.join(md, f))
        return len(stale)
