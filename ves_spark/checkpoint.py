"""Checkpoint / lineage store: exactly-once, resumable increments.

Spark translation of the reference's checkpoint design
(``Checkpoint{files: HashMap<Inode, FileState>}``, reference
src/watcher/models.rs:46-58, hardened by ADR/Watcher/
000x-checkpoint-store.md:19-33). The ADR invariants map as:

  1. store is the single source of truth for progress   -> the lineage
     table alone decides what is done; no driver memory matters.
  2. survives crashes                                    -> parquet on
     durable storage, one immutable file per commit.
  3. in-memory view reconstructable                      -> committed_units()
     is a pure read of the table.
  4. persist-before-in-memory (write-ahead)              -> sink data is
     written BEFORE the lineage row; a unit is "done" only once its
     lineage row exists. A crash between the two leaves orphaned sink
     files that the next run OVERWRITES (run-scoped rewrite of the
     unit's partition directory), never double-counts.
  5. storage-agnostic logic                              -> this module is
     the seam; an Iceberg catalog implementation drops in by replacing
     the parquet read/append (see sources/catalog.py).

Work units are (batch_seq, doc_id hash-bucket) pairs:

* ``batch_seq`` is an ingest batch — a set of input files discovered
  together, recorded write-ahead in the ingest log before any of its
  rows are processed (the reference's rescan-every-5s discovery loop,
  src/watcher/discovery.rs:56-87: new inodes become new tail jobs,
  known inodes are skipped). Data appended to the input AFTER a full
  run forms a new batch and is processed exactly once — the
  reference's core semantic of exactly-once per record *as data keeps
  arriving*, not just per static dataset.
* ``unit_id = pmod(xxhash64(doc_id), n_units)`` subdivides a batch —
  the Spark analogue of "one file/inode": stable identity, uniform
  size, independent of physical file layout.

Resume is the reference's dedup-by-identity anti-join
(discovery.rs:33-35, 71-73):

    todo = (batches x units) LEFT ANTI JOIN committed_lineage
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone
from typing import NamedTuple

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unit_col(n_units: int):
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_units)).cast("int")


class FpParts(NamedTuple):
    """Parsed file fingerprint. v1 = "size:tail_md5" (pre-round-6
    stores); v2 = "size:tail_md5:head_md5:nrows" — the head hash and
    parquet row count exist so discovery can tell a pure APPEND (head
    unchanged, size and nrows grew — the reference tailer's
    "reads only new bytes" precondition, src/tailer/models.rs:84-86)
    from a rewrite-in-place (anything else)."""

    size: int
    tail: str
    head: str | None  # None = v1 fingerprint (no head hash recorded)
    nrows: int  # -1 = unknown (v1, or footer unreadable)


def fp_parts(fp: str | None) -> FpParts:
    if not fp:
        return FpParts(-1, "", None, -1)
    p = fp.split(":")
    if len(p) == 2:
        return FpParts(int(p[0]), p[1], None, -1)
    return FpParts(int(p[0]), p[1], p[2], int(p[3]))


def fp_equal(stored: str | None, current: str | None) -> bool:
    """Same content? A v1 fingerprint on either side compares on the
    (size, tail) fields it carries — so upgrading the fingerprint
    format ADOPTS rather than retiring every committed batch."""
    if stored is None or current is None:
        return False
    s, c = fp_parts(stored), fp_parts(current)
    if s.head is None or c.head is None:
        return s.size == c.size and s.tail == c.tail
    return stored == current


class LineageStore:
    """Append-only lineage/metrics table backed by parquet files.

    Appends are tiny (a handful of rows) and must be atomic +
    immediately durable, so each commit is one parquet file written
    via pyarrow with an O(1) rename — the moral equivalent of an
    Iceberg metadata commit. Reads go through Spark so resume logic
    is a DataFrame anti-join like everything else.
    """

    def __init__(self, path: str, compact_every: int = 64):
        """``compact_every``: when the live file count reaches this,
        ``append`` folds them into one compacted parquet (bounds
        ``read()``'s file listing at ~compact_every regardless of how
        many increments have ever committed)."""
        self.path = path
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

    _SCHEMA = pa.schema(
        [
            ("run_id", pa.string()),
            ("stage", pa.string()),
            ("batch_seq", pa.int32()),
            ("unit_id", pa.int32()),
            ("source", pa.string()),
            ("rows", pa.int64()),
            ("bytes", pa.int64()),
            ("snapshot_id", pa.int64()),
            ("fingerprint", pa.string()),
            ("committed_at", pa.timestamp("us")),
        ]
    )

    def append(self, rows: list[dict]) -> None:
        if not rows:
            return
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        for r in rows:
            r.setdefault("committed_at", now)
            r.setdefault("batch_seq", 0)
            r.setdefault("fingerprint", None)
        tbl = pa.Table.from_pylist(rows, schema=self._SCHEMA)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.parquet")
        final = os.path.join(self.path, f"commit-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, tmp)
        # Durability, not just atomicity (ADR invariant 2 covers power
        # loss, not only process crashes): fsync the data before the
        # rename, and the directory entry after it — the same protocol
        # an Iceberg metadata commit relies on.
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.rename(tmp, final)  # atomic publish
        dfd = os.open(self.path, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        if len(self._live_files()) >= self.compact_every:
            self.compact()

    # ------------------------------------------------------- compaction
    # Unbounded increments would leave one parquet file per commit —
    # read() becomes a 10^5-file listing after 10^5 increments. compact()
    # folds all live files into one, using a TOMBSTONE as the atomic
    # commit point so every crash window is safe:
    #
    #   1. write compact-<id>.parquet  (union of live rows; fsync+rename)
    #   2. write tombstone-<id>.json   {compact: ..., replaces: [...]}
    #      (fsync+rename — THE commit point)
    #   3. best-effort delete replaced files + obsolete tombstones
    #
    # Readers: a compact file counts only if its tombstone exists (a
    # crash between 1 and 2 leaves an ignored orphan); a file named in
    # any tombstone's `replaces` is dead even if still on disk (a crash
    # during 3 leaves no duplicates). Lineage rows are immutable facts,
    # so compaction is a pure re-layout — contents identical.

    def _tombstones(self) -> list[dict]:
        import json

        out = []
        for f in os.listdir(self.path):
            if f.startswith("tombstone-") and f.endswith(".json"):
                with open(os.path.join(self.path, f)) as fh:
                    t = json.load(fh)
                t["_name"] = f
                out.append(t)
        return out

    def _live_files(self) -> list[str]:
        names = set(os.listdir(self.path))
        valid_compacts: set[str] = set()
        replaced: set[str] = set()
        for t in self._tombstones():
            valid_compacts.add(t["compact"])
            replaced.update(t["replaces"])
        live = []
        for f in sorted(names):
            if f in replaced or not f.endswith(".parquet"):
                continue
            if f.startswith("commit-") or (
                f.startswith("compact-") and f in valid_compacts
            ):
                live.append(f)
        return live

    def _conform(self, tbl: pa.Table) -> pa.Table:
        """Cast a lineage table to the current _SCHEMA, null-filling
        columns that predate it (e.g. stores written before the
        'fingerprint' column existed must keep compacting/reading
        after an upgrade — schema evolution, not a crash)."""
        cols = []
        for f in self._SCHEMA:
            if f.name in tbl.column_names:
                cols.append(tbl.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(len(tbl), f.type))
        return pa.Table.from_arrays(cols, schema=self._SCHEMA)

    def compact(self) -> None:
        """Fold live files into one. Guarded by an exclusive lock so
        two writers sharing a store can't both commit overlapping
        compacts (which would double-count rows/bytes metrics read
        straight off the lineage table); the loser skips — compaction
        is opportunistic, the next append retries. A lock left by a
        crashed process is broken after a staleness window (compaction
        takes milliseconds; minutes-old means dead owner)."""
        lock = os.path.join(self.path, ".compact.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                import time

                if time.time() - os.path.getmtime(lock) < 600:
                    return  # live competitor: skip, next append retries
                # stale (crashed owner): break it via RENAME — atomic
                # single-winner takeover. remove-then-create would
                # race: two breakers could both pass the staleness
                # check and the second remove() would delete the
                # first's FRESH lock, running two compactions
                # concurrently. rename succeeds for exactly one
                # process; losers hit FileNotFoundError and skip.
                broken = f"{lock}.broken-{uuid.uuid4().hex}"
                os.rename(lock, broken)
                try:
                    os.remove(broken)
                except OSError:
                    pass
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except OSError:
                return
        try:
            self._compact_locked()
        finally:
            # Release ONLY if we still own the lock path: an owner that
            # survived past the staleness window has been renamed away
            # by a thief, and an unconditional remove here would delete
            # the thief's FRESH lock — letting a third compactor in.
            # Ownership test = our fd's inode still lives at the lock
            # path (the steal is a rename, so a stolen lock's path
            # holds a different inode).
            try:
                owned = os.fstat(fd).st_ino == os.stat(lock).st_ino
            except OSError:
                owned = False
            os.close(fd)
            if owned:
                try:
                    os.remove(lock)
                except OSError:
                    pass

    def _compact_locked(self) -> None:
        import json

        live = self._live_files()
        if len(live) <= 1:
            return
        tbl = pa.concat_tables(
            [self._conform(pq.read_table(os.path.join(self.path, f))) for f in live]
        )
        cid = uuid.uuid4().hex
        cname = f"compact-{cid}.parquet"
        tmp = os.path.join(self.path, f".tmp-{cid}.parquet")
        pq.write_table(tbl, tmp)
        self._fsync_file(tmp)
        os.rename(tmp, os.path.join(self.path, cname))

        old_tombs = [t["_name"] for t in self._tombstones()]
        tname = f"tombstone-{cid}.json"
        ttmp = os.path.join(self.path, f".tmp-{cid}.json")
        with open(ttmp, "w") as fh:
            json.dump({"compact": cname, "replaces": live}, fh)
        self._fsync_file(ttmp)
        os.rename(ttmp, os.path.join(self.path, tname))  # commit point
        self._fsync_dir()

        # best-effort cleanup; any crash here is repaired by the reader
        # rules and finished by the next compaction
        for f in live:
            try:
                os.remove(os.path.join(self.path, f))
            except OSError:
                pass
        for t in old_tombs:
            try:
                os.remove(os.path.join(self.path, t))
            except OSError:
                pass

    def _fsync_file(self, p: str) -> None:
        fd = os.open(p, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def _fsync_dir(self) -> None:
        dfd = os.open(self.path, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _files(self) -> list[str]:
        return [os.path.join(self.path, f) for f in self._live_files()]

    def read(self, spark) -> DataFrame | None:
        files = self._files()
        if not files:
            return None
        # mergeSchema: a store may mix files written before and after
        # a schema addition (e.g. 'fingerprint'); without it Spark can
        # resolve the union schema from an old file and break readers
        # that select the new column. Null-fill any column still
        # missing (an all-old-files store) so readers always see the
        # full current schema.
        df = spark.read.option("mergeSchema", "true").parquet(*files)
        spark_types = {
            "string": "string",
            "int32": "int",
            "int64": "long",
            "timestamp[us]": "timestamp",
        }
        for f in self._SCHEMA:
            if f.name not in df.columns:
                df = df.withColumn(
                    f.name, F.lit(None).cast(spark_types[str(f.type)])
                )
        return df

    def committed_units(
        self, spark, batch_seq: int | None = None, stage: str = "route"
    ) -> set[int]:
        df = self.read(spark)
        if df is None:
            return set()
        df = df.filter(F.col("stage") == stage)
        if batch_seq is not None:
            df = df.filter(F.col("batch_seq") == batch_seq)
        rows = df.select("unit_id").distinct().collect()
        return {r["unit_id"] for r in rows}

    # ------------------------------------------------------ stat cache
    # Discovery optimization (NOT part of the commit protocol): maps
    # input path -> (size, mtime_ns, fingerprint) so steady-state
    # discovery re-hashes nothing. Authoritative identity stays the
    # fingerprint in the ingest log; this file can be deleted at any
    # time at the cost of one re-hash pass.

    _STAT_CACHE = "statcache.json"

    def read_stat_cache(self) -> dict[str, tuple[int, int, str]]:
        import json

        p = os.path.join(self.path, self._STAT_CACHE)
        try:
            with open(p) as fh:
                return {k: tuple(v) for k, v in json.load(fh).items()}
        except (OSError, ValueError):
            return {}

    def write_stat_cache(self, entries: dict[str, tuple[int, int, str]]) -> None:
        import json

        tmp = os.path.join(self.path, f".tmp-stat-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump({k: list(v) for k, v in entries.items()}, fh)
        os.rename(tmp, os.path.join(self.path, self._STAT_CACHE))

    # ------------------------------------------------------ ingest log
    # Discovery state: which input files belong to which ingest batch.
    # Written WRITE-AHEAD (before any row of the batch is processed) so
    # a crash between discovery and processing cannot orphan the
    # file→batch assignment — the reference persists checkpoint entries
    # before tailing starts (src/watcher/watcher.rs:35-89).

    def record_ingest(
        self,
        batch_seq: int,
        files: list[str],
        run_id: str,
        fingerprints: dict[str, str] | None = None,
    ) -> None:
        fps = fingerprints or {}
        self.append(
            [
                {
                    "run_id": run_id,
                    "stage": "ingest",
                    "batch_seq": batch_seq,
                    "unit_id": -1,
                    "source": f,
                    "rows": 0,
                    "bytes": os.path.getsize(f) if os.path.exists(f) else 0,
                    "snapshot_id": batch_seq,
                    "fingerprint": fps.get(f),
                }
                for f in files
            ]
        )

    def record_retire(self, batch_seq: int, run_id: str, reason: str) -> None:
        """Mark a batch dead (its input files were removed or rewritten
        — the reference's FileRemoved / FileRotated lifecycle,
        src/watcher/events.rs:18-65). Written AFTER the batch's output
        partitions are deleted, so the retire row implies the data is
        gone; a crash in between re-triggers retirement on the next
        discover (the path-missing / fingerprint-changed condition
        still holds, and partition deletion is idempotent)."""
        self.append(
            [
                {
                    "run_id": run_id,
                    "stage": "retire",
                    "batch_seq": batch_seq,
                    "unit_id": -1,
                    "source": reason,
                    "rows": 0,
                    "bytes": 0,
                    "snapshot_id": batch_seq,
                }
            ]
        )

    def record_append_batch(
        self,
        batch_seq: int,
        run_id: str,
        extracts: list[dict],
        claims: list[dict],
    ) -> None:
        """Commit an APPEND batch in ONE atomic lineage append: the
        ingest rows for the extract files the batch will READ, plus an
        'append-claim' row per ORIGINAL grown file recording the new
        fingerprint and the row high-water mark the extract covers
        (rows = hi). A crash before this call leaves only orphan
        extract files (overwritten on retry — deterministic names); a
        crash after it resumes through normal unit-level pending work.

        ``extracts``: [{source, fingerprint, bytes}]  (extract files)
        ``claims``:   [{source, fingerprint, rows}]   (original files)
        """
        rows = [
            {
                "run_id": run_id,
                "stage": "ingest",
                "batch_seq": batch_seq,
                "unit_id": -1,
                "source": e["source"],
                "rows": 0,
                "bytes": e.get("bytes", 0),
                "snapshot_id": batch_seq,
                "fingerprint": e["fingerprint"],
            }
            for e in extracts
        ] + [
            {
                "run_id": run_id,
                "stage": "append-claim",
                "batch_seq": batch_seq,
                "unit_id": -2,
                "source": c["source"],
                "rows": int(c.get("rows", fp_parts(c["fingerprint"]).nrows)),
                "bytes": 0,
                "snapshot_id": batch_seq,
                "fingerprint": c["fingerprint"],
            }
            for c in claims
        ]
        self.append(rows)

    # --------------------------------------------- discovery (Spark-side)
    # Driver-memory discipline (round-5 'What's wrong #2'): the
    # per-(batch, file) map stays a Spark frame; the driver collects
    #   * discovery_delta: ONLY paths whose fingerprint differs from
    #     the current input set (steady state: zero rows) + one max agg,
    #   * pending_work: one row per batch (done-unit counts), then unit
    #     sets + file lists ONLY for batches that still have work,
    #   * batch_files / claims_by_paths: filtered to the (rare) change
    #     set.
    # Steady-state driver materialization is O(batches), never
    # O(batches x files); the O(current files) `current` dict is the
    # discovery stat pass itself, inherent to a driver-side lister.

    _EPOCH_ORD = "struct(committed_at IS NOT NULL, committed_at, coalesce(fingerprint, ''))"

    def _claims(self, spark) -> DataFrame | None:
        """Latest ACTIVE claim per (batch_seq, source): an 'ingest'
        row claims the file the batch reads; an 'append-claim' row
        claims the original grown file an append batch extracted
        from. Later rows for the same (batch, source) — fingerprint
        adoptions, format upgrades — supersede earlier ones
        (latest committed_at; fingerprint string as the tiebreak, so
        a v2 fingerprint beats its v1/None predecessor even on a
        timestamp collision)."""
        df = self.read(spark)
        if df is None:
            return None
        retired = (
            df.filter(F.col("stage") == "retire")
            .select("batch_seq")
            .distinct()
        )
        return (
            df.filter(F.col("stage").isin("ingest", "append-claim"))
            .join(retired, "batch_seq", "left_anti")
            .groupBy("batch_seq", "source")
            .agg(
                F.expr(
                    f"max_by(struct(fingerprint, stage), {self._EPOCH_ORD})"
                ).alias("v")
            )
            .select(
                "batch_seq",
                "source",
                F.col("v.fingerprint").alias("fingerprint"),
                F.col("v.stage").alias("kind"),
            )
        )

    def discovery_delta(self, spark, current: dict[str, str]) -> dict:
        """Compare the current input fingerprints against the stored
        claims IN SPARK and return only the differences:

        ``new``     — paths with no active claim
        ``changed`` — [{path, batch_seq, kind, fingerprint, cur_fp,
                        batches}] where the authoritative claim (the
                        highest-seq batch claiming the path) disagrees
                        with the current fingerprint
        ``missing`` — [{path, fingerprint, batches}] claimed paths
                        absent from the current input set
        ``max_seq`` — highest batch_seq ever assigned (incl. retired)

        Steady state collects ZERO delta rows."""
        claims = self._claims(spark)
        if claims is None:
            return {
                "new": sorted(current),
                "changed": [],
                "missing": [],
                "max_seq": -1,
            }
        mx = self.read(spark).agg(F.max("batch_seq")).first()[0]
        per_path = claims.groupBy("source").agg(
            F.expr(
                "max_by(struct(batch_seq, fingerprint, kind), batch_seq)"
            ).alias("a"),
            F.sort_array(F.collect_set("batch_seq")).alias("batches"),
        )
        cur_df = spark.createDataFrame(
            list(current.items()) or [], "source string, cur_fp string"
        )
        delta = (
            per_path.join(cur_df, "source", "full_outer")
            .filter(
                F.col("a").isNull()
                | F.col("cur_fp").isNull()
                | F.col("a.fingerprint").isNull()
                | (F.col("a.fingerprint") != F.col("cur_fp"))
            )
            .collect()
        )
        new, changed, missing = [], [], []
        for r in delta:
            if r["a"] is None:
                new.append(r["source"])
            elif r["cur_fp"] is None:
                missing.append(
                    {
                        "path": r["source"],
                        "fingerprint": r["a"]["fingerprint"],
                        "batches": [int(b) for b in r["batches"]],
                    }
                )
            else:
                changed.append(
                    {
                        "path": r["source"],
                        "batch_seq": int(r["a"]["batch_seq"]),
                        "kind": r["a"]["kind"],
                        "fingerprint": r["a"]["fingerprint"],
                        "cur_fp": r["cur_fp"],
                        "batches": [int(b) for b in r["batches"]],
                    }
                )
        return {
            "new": sorted(new),
            "changed": changed,
            "missing": missing,
            "max_seq": -1 if mx is None else int(mx),
        }

    def pending_work(
        self, spark, n_units: int
    ) -> list[tuple[int, list[str], list[int]]]:
        """(batch_seq, read files, pending unit ids) for every active
        batch with uncommitted units. Collects one count row per
        active batch, then unit sets + file lists only for the
        incomplete ones — a fully-committed store collects O(batches)
        tiny rows and zero file lists."""
        df = self.read(spark)
        if df is None:
            return []
        retired = (
            df.filter(F.col("stage") == "retire").select("batch_seq").distinct()
        )
        ing = df.filter(F.col("stage") == "ingest").join(
            retired, "batch_seq", "left_anti"
        )
        done = (
            df.filter(F.col("stage") == "route")
            .join(retired, "batch_seq", "left_anti")
            .select("batch_seq", "unit_id")
            .distinct()
        )
        counts = done.groupBy("batch_seq").agg(
            F.countDistinct("unit_id").alias("n_done")
        )
        incomplete = [
            int(r["batch_seq"])
            for r in ing.select("batch_seq")
            .distinct()
            .join(counts, "batch_seq", "left")
            .filter(F.coalesce(F.col("n_done"), F.lit(0)) < n_units)
            .collect()
        ]
        if not incomplete:
            return []
        done_units: dict[int, set[int]] = {}
        for r in done.filter(F.col("batch_seq").isin(incomplete)).collect():
            done_units.setdefault(int(r["batch_seq"]), set()).add(
                int(r["unit_id"])
            )
        files = self.batch_files(spark, incomplete)
        out = []
        for seq in sorted(incomplete):
            pend = [
                u for u in range(n_units) if u not in done_units.get(seq, set())
            ]
            out.append((seq, files.get(seq, []), pend))
        return out

    def batch_files(self, spark, seqs) -> dict[int, list[str]]:
        """batch_seq -> sorted files the batch READS (ingest rows
        only; append-claim rows name the original grown file, which
        the append batch does NOT read). Filtered collect — O(files
        in the requested batches)."""
        df = self.read(spark)
        seqs = [int(s) for s in seqs]
        if df is None or not seqs:
            return {}
        rows = (
            df.filter(
                (F.col("stage") == "ingest") & F.col("batch_seq").isin(seqs)
            )
            .select("batch_seq", "source")
            .distinct()
            .collect()
        )
        out: dict[int, list[str]] = {}
        for r in rows:
            out.setdefault(int(r["batch_seq"]), []).append(r["source"])
        return {k: sorted(v) for k, v in out.items()}

    def batch_sources(self, spark, seqs) -> dict[int, list[str]]:
        """batch_seq -> every path the batch touches (ingest AND
        append-claim rows) — the edge set for the retire closure."""
        df = self.read(spark)
        seqs = [int(s) for s in seqs]
        if df is None or not seqs:
            return {}
        rows = (
            df.filter(
                F.col("stage").isin("ingest", "append-claim")
                & F.col("batch_seq").isin(seqs)
            )
            .select("batch_seq", "source")
            .distinct()
            .collect()
        )
        out: dict[int, list[str]] = {}
        for r in rows:
            out.setdefault(int(r["batch_seq"]), []).append(r["source"])
        return {k: sorted(v) for k, v in out.items()}

    def claims_by_paths(
        self, spark, paths: list[str]
    ) -> dict[str, list[tuple[int, str]]]:
        """path -> [(active batch claiming it, claim kind)] — the
        reverse edge set for the retire closure. Filtered collect."""
        claims = self._claims(spark)
        if claims is None or not paths:
            return {}
        rows = (
            claims.filter(F.col("source").isin(list(paths)))
            .select("source", "batch_seq", "kind")
            .collect()
        )
        out: dict[str, list[tuple[int, str]]] = {}
        for r in rows:
            out.setdefault(r["source"], []).append(
                (int(r["batch_seq"]), r["kind"])
            )
        return out

    def ingest_state(self, spark) -> tuple[dict[int, dict[str, str]], int]:
        """(active batches as batch_seq -> {file: fingerprint}, max
        batch_seq ever assigned — INCLUDING retired ones, so retired
        seq numbers are never reused: a reused seq would inherit the
        dead batch's committed_units and skip real work).

        LEGACY/diagnostic API: materializes every (batch, file) row on
        the driver. The pipeline's discovery uses discovery_delta /
        pending_work instead, which keep the per-file map in Spark and
        collect O(changes) + O(batches)."""
        df = self.read(spark)
        if df is None:
            return {}, -1
        rows = (
            df.filter(F.col("stage").isin("ingest", "retire"))
            .select("stage", "batch_seq", "source", "fingerprint")
            .distinct()
            .collect()
        )
        retired = {int(r["batch_seq"]) for r in rows if r["stage"] == "retire"}
        out: dict[int, dict[str, str]] = {}
        max_seq = -1
        for r in rows:
            if r["stage"] != "ingest":
                continue
            seq = int(r["batch_seq"])
            max_seq = max(max_seq, seq)
            if seq not in retired:
                cur = out.setdefault(seq, {})
                # a (seq, path) may carry two ingest rows after a
                # fingerprint ADOPTION (pre-upgrade None + adopted
                # value): the non-null one is authoritative, and row
                # order from distinct() is arbitrary — never let a
                # None overwrite a recorded fingerprint
                if r["fingerprint"] is not None or r["source"] not in cur:
                    cur.setdefault(r["source"], None)
                    if r["fingerprint"] is not None:
                        cur[r["source"]] = r["fingerprint"]
        return out, max(max_seq, max(retired, default=-1))

    def ingest_batches(self, spark) -> dict[int, list[str]]:
        """batch_seq -> sorted input files, for ACTIVE (non-retired)
        batches."""
        state, _ = self.ingest_state(spark)
        return {k: sorted(v) for k, v in state.items()}


def pending_units(
    spark, store: LineageStore, n_units: int, batch_seq: int = 0, stage: str = "route"
) -> list[int]:
    """All units minus committed for one batch — the anti-join,
    computed on unit ids (n_units is small; the expensive anti-join
    happens implicitly by never reading committed units' rows at all,
    which beats a row-level anti-join at 100 TB: pruning >>
    filtering)."""
    done = store.committed_units(spark, batch_seq, stage)
    return [u for u in range(n_units) if u not in done]
