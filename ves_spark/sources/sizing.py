"""Output file sizing: target-size parquet writes + small-files
compaction (the Iceberg ``rewrite_data_files`` analogue for the
parquet catalog).

Why this is a first-class operator at 100 TB: a job's output file
geometry is set by its LAST stage's partitioning, which is tuned for
compute, not storage. A 10k-task final stage writing a 1 TB result
produces 10k ~100 MB files (fine) — but the same stage writing a
10 GB result produces 10k 1 MB files, and every downstream scan then
pays 10k open/seek/footer reads (plus NameNode/object-store metadata
pressure). The inverse failure — one giant file — serializes any
non-splittable consumer. The fix is always the same: estimate
bytes/row, derive rows/file for a byte target, and give the write
exactly ``ceil(total/target)`` partitions with ``maxRecordsPerFile``
as the hard per-file cap.

Reference basis: the reference sizes its reads (16 KiB chunk buffer,
`src/tailer/reader.rs:10`) but writes nothing; sink-side sizing is
the missing half its declared sink stage would need
(`src/tailer/manager.rs:21-29`).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_row_bytes(
    df: DataFrame, probe_rows: int = 2000, tmp_root: str = "/tmp"
) -> float:
    """On-disk (encoded + compressed) bytes per row, measured by
    writing a small deterministic probe (``limit(probe_rows)``) as
    parquet and dividing. One tiny job; the probe understates the
    compression ratio of dictionary-heavy columns slightly (smaller
    dictionaries amortize worse), which biases file sizes UNDER the
    target — the safe direction. Raises on an empty input."""
    tmp = os.path.join(tmp_root, f"_ves_size_probe_{uuid.uuid4().hex}")
    try:
        probe = df.limit(int(probe_rows)).coalesce(1)
        probe.write.mode("overwrite").parquet(tmp)
        back = df.sparkSession.read.parquet(tmp)
        n = back.count()
        if n == 0:
            raise ValueError("cannot size an empty DataFrame")
        data = sum(
            os.path.getsize(os.path.join(tmp, f))
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        return data / n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_sized(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 << 20,
    n_rows: int | None = None,
    row_bytes: float | None = None,
    cluster_cols: list[str] | None = None,
    max_files: int = 1 << 20,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as parquet with files near ``target_file_bytes``.

    Derivation: ``rows_per_file = target / bytes_per_row`` (hard cap
    via ``maxRecordsPerFile`` — no file can exceed ~target even under
    skew) and ``n_files = ceil(n_rows / rows_per_file)`` partitions so
    no file lands far UNDER the target either. ``n_rows`` defaults to
    one ``count()`` — over parquet sources that is a footer-metadata
    job; for computed frames pass a known count to avoid the extra
    scan. ``row_bytes`` defaults to a probe write
    (:func:`estimate_row_bytes`).

    ``cluster_cols`` switches the placement exchange to
    ``repartitionByRange`` so output files are value-clustered —
    downstream range predicates then prune whole files via parquet
    min/max footer stats instead of scanning everything (the poor
    man's Z-order, exactly right for time-keyed logs).

    Returns ``{"n_files", "rows_per_file", "row_bytes"}`` for
    observability. Scale shape: one exchange (round-robin or range)
    sized to the OUTPUT, independent of the compute stage's
    partitioning; the write itself is embarrassingly parallel."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    n = df.count() if n_rows is None else int(n_rows)
    if n == 0:
        # nothing to size — write the empty frame as-is (schema file)
        df.coalesce(1).write.mode(mode).parquet(path)
        return {"n_files": 1, "rows_per_file": 0, "row_bytes": 0.0}
    bpr = estimate_row_bytes(df) if row_bytes is None else float(row_bytes)
    rows_per_file = max(1, int(target_file_bytes / max(bpr, 1e-9)))
    n_files = min(max(1, math.ceil(n / rows_per_file)), int(max_files))
    placed = (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        if cluster_cols
        else df.repartition(n_files)
    )
    (
        placed.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
    return {
        "n_files": n_files,
        "rows_per_file": rows_per_file,
        "row_bytes": round(bpr, 2),
    }


def _recover_swap(path: str) -> None:
    """Repair an interrupted :func:`_swap_in` at ``path``.

    The swap protocol is: write ``<path>._compact_*`` completely, then
    ``rename(path, <path>._trash_*)``, then ``rename(compact, path)``,
    then remove trash. A crash between the two renames leaves NO live
    dir — but always a COMPLETE sibling. Recovery: if ``path`` is
    missing, promote the compact copy (the swap's intended outcome) or
    else restore the trash copy; leftover siblings from crashes on
    either side of the window are then removed."""
    base = path.rstrip("/")
    parent, name = os.path.dirname(base) or ".", os.path.basename(base)
    if not os.path.isdir(parent):
        return
    compacts = sorted(
        os.path.join(parent, f)
        for f in os.listdir(parent)
        if f.startswith(name + "._compact_")
    )
    trashes = sorted(
        os.path.join(parent, f)
        for f in os.listdir(parent)
        if f.startswith(name + "._trash_")
    )
    if not os.path.exists(base):
        if compacts:
            os.rename(compacts.pop(), base)
        elif trashes:
            os.rename(trashes.pop(), base)
    for leftover in compacts + trashes:
        shutil.rmtree(leftover, ignore_errors=True)


def _swap_in(write_new, path: str) -> dict:
    """Crash-recoverable directory replace: ``write_new(tmp_dir)``
    builds the complete replacement, then two renames swap it live.
    A crash at any point leaves a complete copy of the table either at
    ``path`` or in one deterministic-prefixed sibling; the next
    :func:`compact_small_files` call on ``path`` auto-repairs via
    :func:`_recover_swap`. Readers racing the two-rename window can
    see a transient missing dir — maintenance runs from the single
    maintenance owner, quiesced, like any table rewrite."""
    tmp_new = path.rstrip("/") + f"._compact_{uuid.uuid4().hex}"
    stats = write_new(tmp_new)
    trash = path.rstrip("/") + f"._trash_{uuid.uuid4().hex}"
    os.rename(path, trash)
    os.rename(tmp_new, path)
    shutil.rmtree(trash, ignore_errors=True)
    return stats


def _leaf_dirs(path: str) -> list[str]:
    """Leaf data directories under a (possibly hive-partitioned)
    parquet table root: dirs that directly hold ``*.parquet`` files.
    Swap-protocol siblings (``._compact_*``/``._trash_*``) and other
    dot/underscore entries are never descended into."""
    leaves = []
    stack = [path.rstrip("/")]
    while stack:
        d = stack.pop()
        entries = os.listdir(d)
        if any(f.endswith(".parquet") for f in entries):
            leaves.append(d)
        stack.extend(
            os.path.join(d, f)
            for f in entries
            if os.path.isdir(os.path.join(d, f))
            and not f.startswith((".", "_"))
            and "._compact_" not in f
            and "._trash_" not in f
        )
    return sorted(leaves)


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    cluster_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet table into target-sized files — the
    maintenance pass for tables that accumulated small files from many
    incremental appends (every `_process_increment` commit is its own
    file set). Equivalent to Iceberg's ``rewrite_data_files``.

    Hive-partitioned tables (``key=value`` subdirectories, e.g. the
    catalog's ``batch_seq=N/...`` layout) are compacted PER LEAF
    PARTITION DIRECTORY, preserving the directory layout exactly — so
    partition-dir protocols (``delete_partitions`` retraction, dynamic
    partition overwrite) keep working on the compacted table, and
    clustering happens where it matters (within files inside a
    partition; partition pruning already handles the partition keys).

    Each leaf rewrite is crash-RECOVERABLE: the resized copy is
    written to a complete sibling temp dir first, then swapped in with
    two renames (old → trash, new → live, trash removed last). A crash
    between the renames leaves no live dir but always a complete
    sibling copy; the next ``compact_small_files`` call repairs it
    (promote the compact copy, else restore trash — ``_recover_swap``).
    NOT safe under a concurrent writer or reader of ``path``; run it
    like any table-maintenance job, from the single maintenance owner.

    ``zorder_cols`` re-clusters the rewrite on the Morton curve of
    those columns (``sources/zorder.py``) instead of a 1-D range —
    the compaction pass is exactly where incremental appends (each
    clustered only within its own commit) get globally re-laid-out
    for multi-dimensional footer-stat pruning."""
    if cluster_cols and zorder_cols:
        raise ValueError("pass cluster_cols OR zorder_cols, not both")
    # Recovery keys off leftover SIBLING dirs, not surviving leaves: a
    # crash mid-swap leaves the leaf itself missing, so walk the tree
    # for swap markers and repair each marked base path first.
    _recover_swap(path)
    for root, dirs, _files in os.walk(path):
        for d in list(dirs):
            for marker in ("._compact_", "._trash_"):
                if marker in d:
                    _recover_swap(os.path.join(root, d.split(marker)[0]))
                    dirs.remove(d)
                    break

    def _leaf_rows(leaf: str) -> int:
        # parquet footer metadata, read driver-side — no Spark job per
        # leaf (a 500-partition table must not pay 500 count() jobs)
        import pyarrow.parquet as pq  # noqa: PLC0415

        return sum(
            pq.ParquetFile(os.path.join(leaf, f)).metadata.num_rows
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        )

    def _compact_one(leaf: str, n_rows: int, bpr: float) -> dict:
        df = spark.read.parquet(leaf)

        def _write(tmp_new: str) -> dict:
            if zorder_cols:
                from ves_spark.sources.zorder import write_zordered  # noqa: PLC0415

                return write_zordered(
                    df,
                    tmp_new,
                    zorder_cols,
                    target_file_bytes=target_file_bytes,
                    n_rows=n_rows,
                    row_bytes=bpr,
                )
            return write_sized(
                df,
                tmp_new,
                target_file_bytes,
                n_rows=n_rows,
                row_bytes=bpr,
                cluster_cols=cluster_cols,
            )

        return _swap_in(_write, leaf)

    leaves = _leaf_dirs(path)
    if not leaves:
        raise ValueError(f"no parquet data under {path!r}")
    before = sum(
        1 for d in leaves for f in os.listdir(d) if f.endswith(".parquet")
    )
    # encoded bytes/row is a property of the TABLE's schema and value
    # distribution, stable across its partitions (same premise as the
    # pipeline's once-per-run probe) — measure it once on the largest
    # leaf, not once per leaf
    rows_per_leaf = {leaf: _leaf_rows(leaf) for leaf in leaves}
    probe_leaf = max(leaves, key=lambda d: rows_per_leaf[d])
    if rows_per_leaf[probe_leaf] == 0:
        bpr = 0.0  # every leaf empty; write_sized handles n=0 itself
    else:
        bpr = estimate_row_bytes(spark.read.parquet(probe_leaf))
    stats: dict = {"n_files": 0, "rows_per_file": 0, "row_bytes": 0.0}
    for leaf in leaves:
        s = _compact_one(leaf, rows_per_leaf[leaf], bpr)
        # write_sized and write_zordered report slightly different key
        # sets; sum/max what each provides
        stats["n_files"] += s.get("n_files", 0)
        stats["rows_per_file"] = max(stats["rows_per_file"], s.get("rows_per_file", 0))
        stats["row_bytes"] = max(stats["row_bytes"], s.get("row_bytes", 0.0))
    stats["files_before"] = before
    stats["partitions_compacted"] = len(leaves)
    if cluster_cols:
        stats["clustered"] = cluster_cols
    if zorder_cols:
        stats["clustered"] = {"zorder": zorder_cols}
    return stats
