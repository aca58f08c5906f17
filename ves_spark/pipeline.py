"""Pipeline driver: the reference's run loop (SURVEY.md §3.4), batch +
resumable + incremental over growing input.

Per run:

    discover input files -> assign NEW files to a new ingest batch
      (recorded write-ahead in the lineage store — the reference's
      rescan loop, src/watcher/discovery.rs:56-87: new inodes become
      new jobs, known inodes are skipped)
    for each (batch, pending unit subset) increment:
      read ONLY that batch's files, scoped to pending units
        -> parse -> enrich -> route          # the normalization stages
        -> delete orphaned (batch, unit) output partitions   [crash cleanup]
        -> write routed rows per (batch, unit, sink)
        -> write per-unit rollup partials
        -> append lineage rows  (LAST — ADR write-ahead invariant 4)

A killed run resumes by recomputing pending = (batches × units) −
committed (reference dedup-by-inode, discovery.rs:33-35). Data
appended to the input AFTER a full run forms a new batch and is
processed exactly once — exactly-once per record as data keeps
arriving, not just per static dataset.

All data reads/writes go through the ``TableCatalog`` seam
(sources/catalog.py): parquet directories here; Iceberg tables (file
discovery becomes snapshot-incremental reads, partition deletes become
table DELETEs) when the runtime jar is present.

Scale notes (local[N] here, 1000 executors in production):
* Discovery is a file listing (metadata-only); with Iceberg it is a
  snapshot diff. Unit selection within a batch is partition pruning on
  a bucket(doc_id) layout — on raw parquet it degrades to a
  scan-filter; semantics identical.
* The whole parse→enrich→route path is one narrow stage: no shuffle
  anywhere before the per-sink writes (parse is a projection, enrich a
  broadcast join, route a projection+explode). A 100 TB run shuffles
  exactly once — the rollup groupBy — and that shuffle carries only
  map-side partials.
* The transform executes ONCE per increment: partials are computed
  from the just-written routed parquet (columnar, pruned to the agg
  columns) and lineage metrics are an aggregate of the partials —
  never a second pass over the input.
* ``repartition(write_partitions, doc_id)`` before the write gives the
  bucketed-by-doc_id layout the north_star mandates and bounds file
  counts; sizes scale by configuring units × write_partitions, not by
  code change.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ves_spark.checkpoint import LineageStore, unit_col
from ves_spark.enrich import enrich
from ves_spark.parse import parse
from ves_spark.route import route
from ves_spark.sources.catalog import get_catalog


@dataclass
class PipelineConfig:
    sequences_path: str
    source_meta_path: str
    route_rules_path: str
    out_dir: str
    n_units: int = 8
    units_per_increment: int = 4
    # Mirror of the reference's `recursive: Option<bool>` (default
    # true) discovery knob (src/watcher/watcher.rs:110,
    # src/watcher/discovery.rs:89-99): walk nested input directories,
    # applying the same dotfile/extension filter at every level.
    recursive: bool = True
    parse_impl: str = "builtin"  # 'builtin' | 'arrow'
    write_partitions: int = 0  # 0 = one output partition per unit
    # >0: cap every routed data file near this many on-disk bytes
    # (maxRecordsPerFile from a once-per-run bytes/row probe —
    # sources/sizing.py). Fixes the giant-file half of output geometry
    # without touching the doc_id bucketing; 0 = uncapped (legacy).
    target_file_bytes: int = 0
    # Exactly-once by CONTENT, not just by unit (the doc-level analogue
    # of the reference's dedup-by-inode, src/watcher/discovery.rs:33-35):
    # drop any doc whose token array was already routed by a COMMITTED
    # increment. Identity = two independent xxhash64s of the token
    # array (an effective 128-bit key; collision odds ~1e-15 at 1e12
    # docs). The surviving copy is the lowest (batch_seq, unit_id,
    # doc_id) one, which is grouping-independent: units are processed
    # in ascending order, so crash/resume, a different
    # units_per_increment, and a single shot all route the same set.
    dedup_content: bool = False
    run_id: str = "run-0"
    prefer_iceberg: bool = False
    # 'parquet' | 'snapshot' (Iceberg contract double) | 'iceberg' |
    # 'auto'; None = legacy prefer_iceberg flag
    catalog_impl: str | None = None
    lineage_compact_every: int = 64
    extra: dict = field(default_factory=dict)


class Pipeline:
    # sketch size for the per-(unit, sink) doc_id cardinality partials:
    # 256 gives ~6% relative stderr, and each partial row is ≤2 KiB
    KMV_K = 256
    # count-min geometry for the per-(unit, sink) token-TRIGRAM
    # frequency partials (operators/cms.py): 4×512 longs = 16 KiB per
    # partial row, point error ≤ 2N/512 with prob ≥ 1 - 2^-4
    CMS_DEPTH = 4
    CMS_WIDTH = 512
    CMS_GRAM_K = 3

    def __init__(self, spark: SparkSession, conf: PipelineConfig):
        self.spark = spark
        self.conf = conf
        # lifetime count of docs dropped by content dedup across every
        # run() of this Pipeline; run() stats report the per-run delta
        self.dup_docs_dropped = 0
        self.store = LineageStore(
            f"{conf.out_dir}/lineage", compact_every=conf.lineage_compact_every
        )
        self.catalog = get_catalog(
            spark, conf.out_dir, conf.prefer_iceberg, impl=conf.catalog_impl
        )
        # Overwrite only the partitions present in the written frame —
        # with the explicit pre-delete this makes crashed-increment
        # output harmless regardless of sink-set changes.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # learned once per run from the first increment's routed frame
        self._routed_rows_per_file: int | None = None

    def _routed_write_options(self, routed) -> dict | None:
        """File-sizing options for the routed write. LOGICAL options:
        each catalog translates to its engine's knob — the v1 parquet
        path honors ``maxRecordsPerFile``, Iceberg's DSv2 writer only
        understands ``target-file-size-bytes`` (it silently ignores
        maxRecordsPerFile), so the raw byte target rides along as
        ``target_file_bytes``. The rows cap comes from one bytes/row
        probe per RUN (a limit-bounded tiny parquet write of the
        computed frame), then stays constant — encoded bytes/row is
        stable across increments of the same stream, and re-probing
        per increment would add a job to every batch."""
        if self.conf.target_file_bytes <= 0:
            return None
        if self._routed_rows_per_file is None:
            from ves_spark.sources.sizing import estimate_row_bytes

            bpr = estimate_row_bytes(routed)
            self._routed_rows_per_file = max(
                1, int(self.conf.target_file_bytes / max(bpr, 1e-9))
            )
        return {
            "maxRecordsPerFile": self._routed_rows_per_file,
            "target_file_bytes": self.conf.target_file_bytes,
        }

    # -------------------------------------------------------- discovery
    def _keep(self, name: str) -> bool:
        return name.endswith(".parquet") and not name.startswith((".", "_"))

    def _list_input_files(self) -> list[str]:
        """Current input files (sorted). A single-file path is one
        'inode'; a directory is scanned — recursively when
        ``conf.recursive`` (the reference's default-true `recursive`
        knob, src/watcher/discovery.rs:89-99), with the same
        dotfile/extension filter at every level; appended part files
        are the growth vector (reference: new files under log_dir,
        src/watcher/discovery.rs:90-116)."""
        # realpath in BOTH branches: file identity is the path string
        # compared against the ingest log, so a relative vs absolute
        # --sequences path (or a changed cwd) must not re-ingest every
        # file as a new batch and double-count rows.
        p = os.path.realpath(self.conf.sequences_path)
        if os.path.isfile(p):
            return [p]
        if not self.conf.recursive:
            return sorted(
                os.path.join(p, f) for f in os.listdir(p) if self._keep(f)
            )
        out = []
        for root, dirs, files in os.walk(p):
            # prune hidden/system dirs in place (Spark's _temporary,
            # dotdirs) so the walk never descends into them
            dirs[:] = sorted(d for d in dirs if not d.startswith((".", "_")))
            out.extend(os.path.join(root, f) for f in files if self._keep(f))
        return sorted(out)

    @staticmethod
    def _file_fingerprint(path: str, tail_bytes: int = 65536) -> str:
        """Content identity v2: ``size:tail_md5:head_md5:nrows``. The
        tail holds the parquet footer (schema, row-group offsets,
        stats), so any rewrite-in-place changes it; the HEAD hash and
        footer row count exist so discovery can classify a change as
        a pure APPEND (head unchanged + size and nrows grew — the
        reference tailer's "reads only new bytes … without re-opening"
        precondition, src/tailer/models.rs:84-86) instead of a
        rotation. Reading 2x64 KiB + the footer per file keeps
        discovery metadata-cheap at 10^5 files; like the stat-cache
        skip, a rewrite that preserves the first 64 KiB while growing
        is classified as an append — acceptable for log-shaped inputs
        where closed files are immutable and growth means append."""
        import hashlib

        size = os.path.getsize(path)
        head = hashlib.md5()
        with open(path, "rb") as f:
            head.update(f.read(min(size, tail_bytes)))
            if size > tail_bytes:
                tail = hashlib.md5()
                f.seek(size - tail_bytes)
                tail.update(f.read(tail_bytes))
            else:
                tail = head  # v1 semantics: tiny file, tail == whole == head
        try:
            import pyarrow.parquet as pq

            nrows = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            nrows = -1  # unreadable footer: append detection disabled
        return f"{size}:{tail.hexdigest()}:{head.hexdigest()}:{nrows}"

    def _fingerprints(self, paths: list[str]) -> dict[str, str]:
        """Fingerprints for the current input set, hashing only what
        changed: a per-store stat cache (path -> size, mtime_ns,
        fingerprint) lets a steady-state discover() over 10^5
        unchanged files do 10^5 stats and ZERO content reads — the
        round-3 driver-side serial-read bottleneck. Residual hashes
        (new/touched files) run on a thread pool: tail reads are
        I/O-bound, so threads overlap them. The cache is a pure
        optimization — deleting it only costs re-hashing — so its
        consistency needs are trivial (atomic rewrite, stat
        re-verified every call). The (size, mtime_ns) skip means a
        rewrite-in-place that preserves BOTH size and mtime goes
        undetected until either changes — the standard rsync-style
        tradeoff, acceptable because closed log files are immutable
        in practice (see discover())."""
        from concurrent.futures import ThreadPoolExecutor

        cached = self.store.read_stat_cache()
        stats = {p: os.stat(p) for p in paths}
        out: dict[str, str] = {}
        to_hash = []
        for p in paths:
            st = stats[p]
            c = cached.get(p)
            # the format check busts v1 ("size:tail") cache entries so
            # an upgraded pipeline re-hashes once and caches v2
            if (
                c
                and c[0] == st.st_size
                and c[1] == st.st_mtime_ns
                and c[2].count(":") >= 3
            ):
                out[p] = c[2]
            else:
                to_hash.append(p)
        if to_hash:
            with ThreadPoolExecutor(min(32, len(to_hash))) as ex:
                for p, fp in zip(to_hash, ex.map(self._file_fingerprint, to_hash)):
                    out[p] = fp
        # MERGE into the cache rather than replacing it: discovery also
        # fingerprints pipeline-owned extract files one at a time, and
        # a replace would wipe the input files' entries (and vice
        # versa). Entries for paths that no longer exist are pruned
        # (one stat each — same order as the stat pass itself).
        entries = {
            p: v for p, v in cached.items() if p in stats or os.path.exists(p)
        }
        entries.update(
            (p, (stats[p].st_size, stats[p].st_mtime_ns, out[p])) for p in paths
        )
        # skip the rewrite when nothing changed: a steady-state rescan
        # loop (every 5 s at 10^5 files) must not re-serialize a
        # multi-MB JSON per scan just to store what it already holds
        if entries != cached:
            self.store.write_stat_cache(entries)
        return out

    def _retire_batch(self, batch_seq: int, reason: str) -> None:
        """FileRemoved/FileRotated (reference src/watcher/events.rs:
        18-65, watcher.rs:35-89): retract a dead batch's contribution.
        Delete-then-record: output partitions go first, the retire
        lineage row is the commit — a crash in between leaves the
        trigger condition intact, so the next discover re-retires."""
        self.catalog.delete_partitions("routed", [{"batch_seq": batch_seq}])
        self.catalog.delete_partitions("rollup_partial", [{"batch_seq": batch_seq}])
        self.catalog.delete_partitions("hdr_partial", [{"batch_seq": batch_seq}])
        self.catalog.delete_partitions("kmv_partial", [{"batch_seq": batch_seq}])
        self.catalog.delete_partitions("cms_partial", [{"batch_seq": batch_seq}])
        self.catalog.delete_partitions("seen_content", [{"batch_seq": batch_seq}])
        self.store.record_retire(batch_seq, self.conf.run_id, reason)

    # ------------------------------------------------ append fast path
    def _appends_dir(self) -> str:
        return os.path.join(os.path.realpath(self.conf.out_dir), "appends")

    def _extract_path(self, path: str, lo: int, hi: int) -> str:
        """Deterministic name for the extract of rows [lo, hi) of
        ``path`` — a crash between extraction and the lineage commit
        re-extracts to the SAME name (overwrite), so orphans never
        accumulate and never double-process."""
        import hashlib

        tag = hashlib.md5(path.encode()).hexdigest()[:10]
        base = os.path.basename(path)
        return os.path.join(
            self._appends_dir(), f"append-{tag}-{lo}-{hi}-{base}"
        )

    @staticmethod
    def _append_boundary_ok(path: str, lo: int) -> bool:
        """A clean append leaves the old end-of-file at a row-group
        boundary (row groups are atomic in parquet). Metadata-only
        check; a misaligned boundary downgrades the event to a
        rotation."""
        import pyarrow.parquet as pq

        try:
            md = pq.ParquetFile(path).metadata
        except Exception:
            return False
        cum = 0
        for i in range(md.num_row_groups):
            if cum == lo:
                return True
            cum += md.row_group(i).num_rows
        return cum == lo

    def _extract_rows(self, path: str, lo: int, hi: int) -> str:
        """Copy the row groups covering rows [lo, hi) of ``path`` into
        an immutable extract file and return its path. I/O is O(new
        bytes) — the reference tailer's "reads only new bytes from the
        source" (src/tailer/reader.rs:30-42) — never O(total file).
        Driver-side like the rest of discovery; append events are the
        rare path and move only the appended data."""
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        md = pf.metadata
        cum = 0
        take: list[int] = []
        for i in range(md.num_row_groups):
            n = md.row_group(i).num_rows
            if cum >= lo and cum + n <= hi:
                take.append(i)
            cum += n
        got = sum(md.row_group(i).num_rows for i in take)
        if got != hi - lo:
            raise RuntimeError(
                f"append extract misaligned for {path}: rows [{lo},{hi}) "
                f"do not cover whole row groups (got {got})"
            )
        out = self._extract_path(path, lo, hi)
        os.makedirs(self._appends_dir(), exist_ok=True)
        tmp = f"{out}.tmp-{os.getpid()}"
        writer = None
        try:
            for i in take:
                t = pf.read_row_group(i)
                if writer is None:
                    writer = pq.ParquetWriter(tmp, t.schema)
                writer.write_table(t, row_group_size=t.num_rows)
        finally:
            if writer is not None:
                writer.close()
        os.replace(tmp, out)
        return out

    def _reconcile(self, current: dict[str, str]) -> bool:
        """Apply the discovery delta to the store: adoptions, retire
        closure, survivor re-ingest, append extraction, new-batch
        record. All mutations are write-ahead lineage commits.
        Returns True when any batch was retired — retirement can
        expose further work (e.g. a lost extract retires its append
        batch, and the original file's rows must then be re-appended
        against the surviving claim), so the caller re-runs the
        reconcile to the fixed point."""
        from ves_spark.checkpoint import fp_equal, fp_parts

        delta = self.store.discovery_delta(self.spark, current)
        appends_dir = self._appends_dir() + os.sep
        retire: dict[int, str] = {}
        adoptions: list[tuple[int, str, str]] = []  # (seq, kind, path)
        appends: list[tuple[str, int, int]] = []  # (path, lo, hi)

        for m in delta["missing"]:
            p = m["path"]
            if p.startswith(appends_dir):
                # pipeline-owned extract file: never part of the input
                # listing, verified directly. Healthy -> no-op.
                if os.path.exists(p) and fp_equal(
                    m["fingerprint"], self._fingerprints([p])[p]
                ):
                    continue
            for b in m["batches"]:
                retire.setdefault(b, f"removed:{p}")

        for c in delta["changed"]:
            stored, cur = c["fingerprint"], c["cur_fp"]
            if stored is None or fp_equal(stored, cur):
                # identity unknown (pre-fingerprint store) or a pure
                # format upgrade: ADOPT, never retire — a no-op
                # upgrade must not reprocess every committed batch
                adoptions.append((c["batch_seq"], c["kind"], c["path"]))
                continue
            s, k = fp_parts(stored), fp_parts(cur)
            if (
                s.head is not None
                and s.head == k.head
                and k.size > s.size
                and s.nrows >= 0
                and k.nrows > s.nrows
                and not c["path"].startswith(appends_dir)
                and self._append_boundary_ok(c["path"], s.nrows)
            ):
                appends.append((c["path"], s.nrows, k.nrows))
            else:
                for b in c["batches"]:
                    retire.setdefault(b, f"rotated:{c['path']}")

        # Retire CLOSURE: retiring a batch also retires every APPEND
        # batch claiming one of its paths — a retired full batch's
        # survivor is re-ingested FULLY (a surviving extract of its
        # suffix would double rows), and a retired append invalidates
        # every LATER append's high-water mark on the same path. The
        # propagation is one-directional: losing an append batch never
        # retires the original full batch (its rows are intact; the
        # suffix just re-appends against the restored claim). Chains
        # are short, so this converges in ~2 rounds.
        while retire:
            touched = {
                p
                for fl in self.store.batch_sources(
                    self.spark, list(retire)
                ).values()
                for p in fl
            }
            grew = False
            for p, bs in self.store.claims_by_paths(
                self.spark, sorted(touched)
            ).items():
                for b, kind in bs:
                    if kind == "append-claim" and b not in retire:
                        retire[b] = f"derived:{p}"
                        grew = True
            if not grew:
                break

        retire_files = (
            self.store.batch_files(self.spark, list(retire)) if retire else {}
        )
        for seq in sorted(retire):
            self._retire_batch(seq, retire[seq])

        # a path claimed only by now-retired batches and still present
        # is re-ingested as new (includes the rotated path itself)
        survivors = {
            p for fl in retire_files.values() for p in fl if p in current
        }
        # an appended path whose claims were all retired must be
        # re-ingested fully, not extracted against a dead claim
        appends = [a for a in appends if a[0] not in survivors]

        by_batch: dict[int, list[str]] = {}
        for seq, kind, path in adoptions:
            if seq in retire:
                continue
            if kind == "ingest":
                by_batch.setdefault(seq, []).append(path)
            else:  # re-affirm an append-claim under the new format
                self.store.record_append_batch(
                    seq,
                    self.conf.run_id,
                    extracts=[],
                    claims=[{"source": path, "fingerprint": current[path]}],
                )
        for seq, paths in by_batch.items():
            self.store.record_ingest(
                seq, sorted(paths), self.conf.run_id, fingerprints=current
            )

        next_seq = delta["max_seq"]
        new_files = sorted(set(delta["new"]) | survivors)
        if new_files:
            next_seq += 1  # never reuse a retired batch's seq
            self.store.record_ingest(
                next_seq, new_files, self.conf.run_id, fingerprints=current
            )
        if appends:
            next_seq += 1
            extracts, claims = [], []
            for path, lo, hi in sorted(appends):
                ep = self._extract_rows(path, lo, hi)
                extracts.append(
                    {
                        "source": ep,
                        "fingerprint": self._fingerprints([ep])[ep],
                        "bytes": os.path.getsize(ep),
                    }
                )
                claims.append(
                    {
                        "source": path,
                        "fingerprint": current[path],
                        "rows": hi,
                    }
                )
            self.store.record_append_batch(
                next_seq, self.conf.run_id, extracts=extracts, claims=claims
            )
        return bool(retire)

    def discover(self) -> list[tuple[int, list[str], list[int]]]:
        """(batch_seq, files, pending_units) for every batch with work.

        Lifecycle (the reference's FileCreated / FileRotated /
        FileRemoved, src/watcher/events.rs:18-65, plus the tailer's
        incremental-read semantic, src/tailer/models.rs:84-86):
        * new path            -> joins a fresh batch (write-ahead
          recorded before any processing, with its fingerprint)
        * known path, same fingerprint -> no-op
        * known path, GROWN (head hash unchanged, size and row count
          grew, old end on a row-group boundary) -> APPEND: only the
          new rows are extracted and ingested as a new batch — N
          appends process O(total) rows overall, never O(total^2)
        * known path, otherwise-changed fingerprint (rewritten or
          rotated in place) -> its claiming batches are retired and
          the path re-ingested as new
        * recorded path now missing -> its batches are retired;
          surviving siblings are re-ingested as new

        Retirement is batch-grained: a batch groups the files of one
        discovery round (one Spark job per increment at scale — 10^5
        per-file batches would mean 10^5 tiny jobs). Closed log files
        are immutable in practice, so retirement is the rare path and
        reprocessing a retired batch's survivors is an acceptable
        cost for exact retraction.

        Driver memory: the per-(batch, file) map stays in Spark
        (checkpoint.discovery_delta / pending_work); the driver holds
        the current-input fingerprint dict (inherent to a driver-side
        lister) plus O(changes) + O(batches) collected rows."""
        current = self._fingerprints(self._list_input_files())
        # fixed point: a retirement can expose follow-up work within
        # the same scan (a lost extract retires its append batch, and
        # the original's new rows then re-append against the restored
        # authoritative claim). Chains are 1-2 links; 4 is a guard.
        for _ in range(4):
            if not self._reconcile(current):
                break
        return self.store.pending_work(self.spark, self.conf.n_units)

    # ------------------------------------------------------------ stages
    def transform(self, seq: DataFrame) -> DataFrame:
        """parse -> enrich -> route on an already-scoped input frame."""
        meta = self.spark.read.parquet(self.conf.source_meta_path)
        rules = self.spark.read.parquet(self.conf.route_rules_path)
        parsed = parse(seq, self.conf.parse_impl)
        enriched = enrich(parsed, meta)
        return route(enriched, rules)

    def _read_units(self, files: list[str], units: list[int]) -> DataFrame:
        seq = self.catalog.read_files(self.spark, files)
        seq = seq.withColumn("unit_id", unit_col(self.conf.n_units))
        return seq.filter(F.col("unit_id").isin(units))

    def _read_table_or_none(self, name: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return self.catalog.read(self.spark, name)
        except (AnalysisException, FileNotFoundError):
            return None

    def _dedup_content(
        self, seq: DataFrame, batch_seq: int, units: list[int]
    ) -> DataFrame:
        """Content-level exactly-once (``conf.dedup_content``): drop
        docs whose token array was already routed by a COMMITTED
        increment, keep the lowest (unit_id, doc_id) copy within this
        increment, and commit the survivors' identities to a
        ``seen_content`` table under the same per-(batch, unit)
        partition lifecycle as the other partials.

        Correctness under crashes: history is ``seen_content``
        SEMI-JOINED to the lineage commit log — an orphan partition
        from a crashed increment must not shadow, or its docs would
        vanish when the unit is reprocessed. Because units are
        processed in ascending order and the in-increment keeper is
        min (unit_id, doc_id), the surviving copy of any content is
        the globally minimal (batch_seq, unit_id, doc_id) one — a rule
        independent of increment grouping, so crash/resume equals
        single-shot bit-for-bit.

        Scale shape: the dedup key is two 8-byte hash columns, so the
        history anti-join shuffles 16 bytes/doc of the NEW increment
        against a hash-only (never token-bearing) history table; at
        extreme history sizes swap the anti-join for the reusable
        bloom bitmap (operators/bloom.py) — same semantics, the
        history side then streams map-side."""
        from pyspark.sql import Window as W

        hashed = seq.select(
            "*",
            F.xxhash64("tokens").alias("h1"),
            F.xxhash64(F.lit("ves-content-dedup"), "tokens").alias("h2"),
        )
        w = W.partitionBy("h1", "h2").orderBy("unit_id", "doc_id")
        kept = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        seen = self._read_table_or_none("seen_content")
        lin = self.store.read(self.spark)
        if seen is not None and lin is not None:
            committed = (
                lin.filter(F.col("stage") == "route")
                .select("batch_seq", "unit_id")
                .distinct()
            )
            seen = seen.join(
                F.broadcast(committed), ["batch_seq", "unit_id"], "left_semi"
            )
            kept = kept.join(
                seen.select("h1", "h2").distinct(), ["h1", "h2"], "left_anti"
            )

        self.catalog.overwrite_partitions(
            kept.select(
                F.lit(batch_seq).alias("batch_seq"), "unit_id", "h1", "h2"
            ).repartition("unit_id"),
            "seen_content",
            ["batch_seq", "unit_id"],
        )
        # drop accounting: input docs minus committed identities (the
        # seen_content read-back is a count over two pruned long
        # columns — feature-gated, never on the default path)
        n_in = seq.count()
        n_kept = (
            self.catalog.read(self.spark, "seen_content")
            .filter(F.col("batch_seq") == batch_seq)
            .filter(F.col("unit_id").isin(units))
            .count()
        )
        self.dup_docs_dropped += n_in - n_kept
        return kept.drop("h1", "h2")

    # ------------------------------------------------------------- run
    def run(self, fail_after_units: int | None = None) -> dict:
        """Discover + process all pending (batch, unit) work in
        increments; returns run stats.

        ``fail_after_units`` simulates a crash (tests): raises after
        that many units have committed, mid-run.
        """
        t0 = time.monotonic()
        n_done = 0
        rows_total = 0
        # per-run accounting: a reused Pipeline (steady-state rescan
        # loop) must not report prior runs' drops in this run's stats
        dropped_at_start = self.dup_docs_dropped
        step = self.conf.units_per_increment
        for batch_seq, files, pending in self.discover():
            for i in range(0, len(pending), step):
                units = pending[i : i + step]
                rows_total += self._process_increment(batch_seq, files, units)
                n_done += len(units)
                if fail_after_units is not None and n_done >= fail_after_units:
                    raise RuntimeError(f"simulated crash after {n_done} units")
        stats = {
            "run_id": self.conf.run_id,
            "units_processed": n_done,
            "rows_routed": rows_total,
            "wall_sec": time.monotonic() - t0,
        }
        if self.conf.dedup_content:
            stats["docs_dropped_dup"] = self.dup_docs_dropped - dropped_at_start
        return stats

    def _process_increment(
        self, batch_seq: int, files: list[str], units: list[int]
    ) -> int:
        conf = self.conf
        # Unit-scoped crash cleanup FIRST: these (batch, unit)
        # partitions have no lineage row, so anything under them is an
        # orphan from a crashed increment — possibly written under OLD
        # route rules with a different sink set. Delete before any
        # read or rewrite (content dedup in particular must never see
        # an orphan seen_content partition as history).
        stale = [{"batch_seq": batch_seq, "unit_id": u} for u in units]
        for t in (
            "routed",
            "rollup_partial",
            "hdr_partial",
            "kmv_partial",
            "cms_partial",
            "seen_content",
        ):
            self.catalog.delete_partitions(t, stale)

        seq = self._read_units(files, units)
        if conf.dedup_content:
            seq = self._dedup_content(seq, batch_seq, units)
        routed = self.transform(seq).withColumn("batch_seq", F.lit(batch_seq))

        nparts = conf.write_partitions or len(units)
        out = routed.repartition(nparts, "doc_id")  # bucketed write on doc_id
        self.catalog.overwrite_partitions(
            out,
            "routed",
            ["batch_seq", "unit_id", "sink"],
            options=self._routed_write_options(routed),
        )

        # Rollup partials per unit — algebraic, so the final rollup is a
        # sum over partials (finalize_rollup). Computed from the
        # just-written routed parquet (columnar, pruned scan) — the
        # transform itself is never executed a second time.
        # One physical pass feeds BOTH partial tables (exact + HDR):
        # without the checkpoint each write re-reads the routed
        # partitions independently, doubling per-increment read I/O.
        routed_back = (
            self.catalog.read(self.spark, "routed")
            .filter(F.col("batch_seq") == batch_seq)
            .filter(F.col("unit_id").isin(units))
            .select(
                "batch_seq",
                "unit_id",
                "sink",
                "source",
                "time_bucket",
                "n_tok",
                "doc_id",
            )
            .localCheckpoint(eager=True)
        )
        partials = routed_back.groupBy(
            "batch_seq", "unit_id", "sink", "source", "time_bucket"
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
            F.sum(F.col("n_tok").cast("long") * 4).alias("sum_bytes"),
        )
        self.catalog.overwrite_partitions(
            partials.repartition("unit_id"),
            "rollup_partial",
            ["batch_seq", "unit_id"],
        )

        # Mergeable percentile partials: HDR log-bucket counts per
        # (unit, group) — same shape the streaming rollup maintains —
        # so finalize_rollup never rescans the routed corpus for
        # percentiles; it merges these (group x bucket)-sized rows.
        from ves_spark.streaming.hdr import rollup_histogram

        hdr = rollup_histogram(
            routed_back,
            ["batch_seq", "unit_id", "sink", "source", "time_bucket"],
            value_col="n_tok",
        )
        self.catalog.overwrite_partitions(
            hdr.repartition("unit_id"),
            "hdr_partial",
            ["batch_seq", "unit_id"],
        )

        # Mergeable cardinality partials: per-(unit, sink) KMV sketch
        # of doc_id (operators/sketches.py) — distinct_docs_per_sink
        # merges these ≤k-long arrays instead of count-distincting the
        # routed corpus, and the merge dedups docs a sink received in
        # MULTIPLE units/batches, which per-unit exact counts cannot.
        from ves_spark.operators.sketches import kmv_sketch

        kmv = kmv_sketch(
            routed_back.select("batch_seq", "unit_id", "sink", "doc_id"),
            "doc_id",
            ["batch_seq", "unit_id", "sink"],
            k=self.KMV_K,
        )
        self.catalog.overwrite_partitions(
            kmv.repartition("unit_id"),
            "kmv_partial",
            ["batch_seq", "unit_id"],
        )

        # Mergeable token-trigram frequency partials: per-(unit, sink)
        # count-min sketch (operators/cms.py). Trigram space is
        # vocab³-unbounded, so unlike the exact rollup partials this
        # one MUST be a sketch; trigram_freq_per_sink merges the
        # fixed-size counter arrays instead of ever re-hashing the
        # routed corpus. Own column-pruned read: routed_back's
        # localCheckpoint deliberately excludes the heavy tokens
        # column, and parquet serves just (sink, tokens) here.
        from ves_spark.operators.cms import cms_sketch
        from ves_spark.operators.token_dedup import _gram_hash_expr

        grams = (
            self.catalog.read(self.spark, "routed")
            .filter(F.col("batch_seq") == batch_seq)
            .filter(F.col("unit_id").isin(units))
            .select(
                "batch_seq",
                "unit_id",
                "sink",
                F.explode(
                    F.expr(
                        _gram_hash_expr("tokens", self.CMS_GRAM_K, "xxhash64")
                    )
                ).alias("gram"),
            )
        )
        cms = cms_sketch(
            grams,
            "gram",
            ["batch_seq", "unit_id", "sink"],
            depth=self.CMS_DEPTH,
            width=self.CMS_WIDTH,
        )
        self.catalog.overwrite_partitions(
            cms.repartition("unit_id"),
            "cms_partial",
            ["batch_seq", "unit_id"],
        )

        # Metrics + lineage — derived from the (tiny, on-disk) partials,
        # then committed LAST (write-ahead invariant 4). One driver
        # collect of per-(unit, source) rows — bounded cardinality.
        metrics = (
            self.catalog.read(self.spark, "rollup_partial")
            .filter(F.col("batch_seq") == batch_seq)
            .filter(F.col("unit_id").isin(units))
            .groupBy("unit_id", "source")
            .agg(F.sum("cnt").alias("rows"), F.sum("sum_bytes").alias("bytes"))
            .collect()
        )
        # Real table snapshot id when the catalog has one (Iceberg /
        # the contract double): 'resumes from the last committed
        # snapshot' becomes literal — lineage rows name the routed
        # table commit they correspond to. Parquet falls back to a
        # wall-clock id (monotonic enough for ordering diagnostics).
        if hasattr(self.catalog, "current_snapshot_id"):
            snapshot_id = int(self.catalog.current_snapshot_id("routed"))
        else:
            snapshot_id = int(time.time() * 1000)
        lineage_rows = [
            {
                "run_id": conf.run_id,
                "stage": "route",
                "batch_seq": batch_seq,
                "unit_id": int(m["unit_id"]),
                "source": m["source"],
                "rows": int(m["rows"]),
                "bytes": int(m["bytes"]),
                "snapshot_id": snapshot_id,
            }
            for m in metrics
        ]
        # Units that produced zero rows still need a lineage row, or
        # they would be reprocessed forever.
        seen = {r["unit_id"] for r in lineage_rows}
        for u in units:
            if u not in seen:
                lineage_rows.append(
                    {
                        "run_id": conf.run_id,
                        "stage": "route",
                        "batch_seq": batch_seq,
                        "unit_id": u,
                        "source": None,
                        "rows": 0,
                        "bytes": 0,
                        "snapshot_id": snapshot_id,
                    }
                )
        self.store.append(lineage_rows)
        return sum(r["rows"] for r in lineage_rows)

    # -------------------------------------------------------- finalize
    def routed(self) -> DataFrame:
        return self.catalog.read(self.spark, "routed")

    def finalize_rollup(self, percentiles: str = "hdr") -> DataFrame:
        """Merge per-unit partials into the final rollup. Counts/sums
        come from ``rollup_partial`` (algebraic, exact). Percentiles
        come from the mergeable HDR log-bucket partials
        (``hdr_partial``, default): finalize only touches
        (group x bucket)-sized rows, NEVER the routed corpus —
        relative quantile error <= 2^-7, exact for n_tok < 256.
        ``percentiles="scan"`` keeps the old percentile_approx pass
        over the routed table (a full corpus rescan per finalize — the
        thing the HDR partials exist to avoid at 100 TB)."""
        if percentiles not in ("hdr", "scan"):
            raise ValueError(
                f"percentiles must be 'hdr' or 'scan', got {percentiles!r}"
            )
        partials = self.catalog.read(self.spark, "rollup_partial")
        exact = partials.groupBy("sink", "source", "time_bucket").agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_n_tok").alias("sum_n_tok"),
            F.sum("sum_bytes").alias("sum_bytes"),
        )
        if percentiles == "hdr":
            from ves_spark.streaming.hdr import percentiles_from_histogram

            hist = (
                self.catalog.read(self.spark, "hdr_partial")
                .groupBy("sink", "source", "time_bucket", "bucket")
                .agg(F.sum("cnt").alias("cnt"), F.sum("sum_v").alias("sum_v"))
            )
            pctl = percentiles_from_histogram(
                hist, ["sink", "source", "time_bucket"]
            ).select("sink", "source", "time_bucket", "p50", "p95", "p99")
        else:
            pctl = (
                self.routed()
                .groupBy("sink", "source", "time_bucket")
                .agg(
                    F.percentile_approx(
                        "n_tok", [0.5, 0.95, 0.99], 10_000
                    ).alias("_p")
                )
                .select(
                    "sink",
                    "source",
                    "time_bucket",
                    F.element_at("_p", 1).cast("long").alias("p50"),
                    F.element_at("_p", 2).cast("long").alias("p95"),
                    F.element_at("_p", 3).cast("long").alias("p99"),
                )
            )
        return exact.join(pctl, ["sink", "source", "time_bucket"])

    def distinct_docs_per_sink(self) -> DataFrame:
        """Distinct-doc cardinality per sink from the committed
        ``kmv_partial`` table: (sink, kth, est_distinct). Never
        touches the routed corpus — it tree-merges the ≤k-long sketch
        arrays (per (sink, batch) first, then per sink, so no merge
        buffer scales with history length), and the merge dedups
        docs delivered across units/batches, exactly like a global
        COUNT(DISTINCT) would. Below k distinct docs the result is
        exact; above, (k-1)/u_k with ~1/sqrt(k) relative error."""
        from ves_spark.operators.sketches import (
            kmv_estimate_cols,
            kmv_merge_agg,
        )

        partials = self.catalog.read(self.spark, "kmv_partial")
        per_batch = partials.groupBy("sink", "batch_seq").agg(
            kmv_merge_agg("mins", self.KMV_K).alias("mins")
        )
        merged = per_batch.groupBy("sink").agg(
            kmv_merge_agg("mins", self.KMV_K).alias("mins")
        )
        return merged.select("sink", *kmv_estimate_cols(self.KMV_K))

    def trigram_freq_per_sink(self, trigrams: list[list[int]]) -> DataFrame:
        """Estimated corpus frequency of each given token trigram per
        sink, from the committed ``cms_partial`` table: (sink, tri_id,
        est_count). Never re-hashes the routed corpus — it tree-merges
        the fixed 4×512 counter arrays (per (sink, batch) first, then
        per sink, same two-level shape as the KMV merge). Estimates
        are one-sided: est_count >= the true delivered count, within
        2N/width of it with prob ≥ 1 - 2^-depth."""
        from ves_spark.operators.cms import (
            cms_estimate,
            cms_merge_agg,
        )

        bad = [t for t in trigrams if len(t) != self.CMS_GRAM_K]
        if bad:
            raise ValueError(
                f"trigram_freq_per_sink: every query must have exactly "
                f"{self.CMS_GRAM_K} tokens, got {bad[0]!r}"
            )
        partials = self.catalog.read(self.spark, "cms_partial")
        per_batch = partials.groupBy("sink", "batch_seq").agg(
            cms_merge_agg("counters").alias("counters")
        )
        merged = per_batch.groupBy("sink").agg(
            cms_merge_agg("counters").alias("counters")
        )
        # gram identity must match _process_increment's builder:
        # xxhash64 over the array<int> token window
        queries = F.array(
            *[
                F.struct(
                    F.lit(i).alias("tri_id"),
                    F.xxhash64(
                        F.array(*[F.lit(int(t)).cast("int") for t in tri])
                    ).alias("gram"),
                )
                for i, tri in enumerate(trigrams)
            ]
        )
        rows = merged.select("sink", "counters", F.explode(queries).alias("q"))
        return rows.select(
            "sink",
            F.col("q.tri_id").alias("tri_id"),
            cms_estimate(
                "counters",
                F.col("q.gram"),
                depth=self.CMS_DEPTH,
                width=self.CMS_WIDTH,
            ).alias("est_count"),
        )
