"""Deterministic synthetic input generator (FIXTURES.md §A-§C).

Generates the canonical ``sequences`` token table plus the
``source_meta`` enrich dim and the ``route_rules`` router config —
seeded, no wall-clock entropy, so every run/scale reproduces exactly.

Built with numpy + pyarrow directly (not Spark) so pytest fixtures are
fast and independent of the system under test.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ves_spark.schema import VOCAB

SOURCES = ["src-hot"] + [f"src-{i:02d}" for i in range(15)]
HOT_SHARE = 0.40  # src-hot ≈ 40% of rows — exercises skew handling
MIN_LEN, MAX_LEN = 8, 512


_DRAW_BLOCK = 32_000_000


def _pretouch(arr: np.ndarray, n_threads: int = 32) -> None:
    """Fault-in a fresh buffer's pages from many threads.

    This sandbox VM serves first-touch page faults through a host
    handler at ~6 MB/s per thread but scales linearly with threads
    (measured: 400 MB memset 29 s single-threaded, 0.07 s with 32
    threads). ctypes.memset releases the GIL, so a thread pool striping
    over the buffer parallelizes the faults.
    """
    import ctypes
    from concurrent.futures import ThreadPoolExecutor

    n = arr.nbytes
    if n < 1 << 24:
        arr.view(np.uint8).fill(0)
        return
    addr = arr.ctypes.data
    stripe = (n + n_threads - 1) // n_threads
    with ThreadPoolExecutor(n_threads) as ex:
        list(
            ex.map(
                lambda i: ctypes.memset(
                    addr + i * stripe, 0, min(stripe, n - i * stripe)
                ),
                range(n_threads),
            )
        )


def _rand_u32(rng: np.random.Generator, size: int) -> np.ndarray:
    # VM-specific pathologies worked around here (all measured):
    # 1. bounded rng.integers(lo, hi) takes the Lemire path whose
    #    64x64->128-bit multiplies run ~100x slow — so draw full-range
    #    uint32 and modulo outside (bias < 2^-16, irrelevant here);
    # 2. first-touch page faults are ~6 MB/s single-threaded — so
    #    pre-fault the output buffer in parallel (_pretouch) and fill
    #    sequentially (RNG stream stays deterministic);
    # 3. fill in 32M-value blocks to bound the generator's own
    #    temporary allocations.
    out = np.empty(size, dtype=np.uint32)
    _pretouch(out)
    for lo in range(0, size, _DRAW_BLOCK):
        hi = min(lo + _DRAW_BLOCK, size)
        out[lo:hi] = rng.integers(0, 2**32, size=hi - lo, dtype=np.uint32)
    return out


def _sequences_chunk(rng: np.random.Generator, start: int, n_rows: int) -> pa.Table:
    # All large arrays are computed IN PLACE on the pre-touched draw
    # buffers and reinterpreted as int32 views (values < 2^31, so the
    # uint32->int32 view is bit-exact) — fresh allocations page-fault
    # at ~6 MB/s on this VM (see _pretouch).
    raw_len = _rand_u32(rng, n_rows)
    np.remainder(raw_len, MAX_LEN - MIN_LEN + 1, out=raw_len)
    raw_len += MIN_LEN
    lengths = raw_len.view(np.int32)
    total = int(lengths.sum())
    raw_vals = _rand_u32(rng, total)
    np.remainder(raw_vals, VOCAB, out=raw_vals)
    values = raw_vals.view(np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))

    # Zipf-skewed source: src-hot gets HOT_SHARE, rest uniform.
    u = _rand_u32(rng, n_rows).astype(np.float64) / 2**32
    rest = (u - HOT_SHARE) / (1.0 - HOT_SHARE) * (len(SOURCES) - 1)
    src_idx = np.where(
        u < HOT_SHARE, 0, 1 + np.minimum(rest, len(SOURCES) - 2).astype(np.int64)
    ).astype(np.int64)
    sources = pa.array(np.array(SOURCES, dtype=object)[src_idx])

    doc_ids = pa.array([f"doc-{i:012d}" for i in range(start, start + n_rows)])
    return pa.table(
        {
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": pa.array(lengths),
            "source": sources,
        }
    )


# int32 list offsets cap a single chunk at ~2^31 token values; 2M rows
# (~0.5G tokens) keeps peak RAM modest and offsets safe.
CHUNK_ROWS = 2_000_000


def make_sequences(n_rows: int, seed: int = 42) -> pa.Table:
    """The canonical input table: (doc_id, tokens, n_tok, source)."""
    rng = np.random.default_rng(seed)
    chunks = [
        _sequences_chunk(rng, start, min(CHUNK_ROWS, n_rows - start))
        for start in range(0, n_rows, CHUNK_ROWS)
    ]
    return pa.concat_tables(chunks)


def make_source_meta() -> pa.Table:
    """Enrich dim (FIXTURES.md §B). Deliberately omits one source
    (src-14) so the left-join 'unknown_tenant' default path is
    exercised — the reference analogue is a payload whose inode has no
    checkpoint entry."""
    rows = []
    tenants = ["tnt-a", "tnt-b", "tnt-c", "tnt-d", "tnt-e"]
    envs = ["prod", "staging", "dev"]
    for i, src in enumerate(SOURCES):
        if src == "src-14":
            continue  # the uncovered source
        rows.append(
            {
                "source": src,
                "tenant": tenants[i % len(tenants)],
                "env": envs[i % len(envs)],
                "priority": 3 if src == "src-hot" else i % 4,
            }
        )
    return pa.Table.from_pylist(rows)


def make_route_rules() -> pa.Table:
    """Router config (FIXTURES.md §C). Predicates are Spark SQL boolean
    expressions over the parsed+enriched frame. A row matching several
    rules fans out to ALL of their sinks (the reference's
    Rotated→[Stop, Start] two-event expansion,
    src/tailer/tailer_events.rs:35-48, generalized)."""
    rows = [
        {"rule_id": 1, "predicate": "level IN ('ERROR','CRITICAL','FATAL')", "sink": "sink_errors"},
        {"rule_id": 2, "predicate": "priority >= 3", "sink": "sink_hot"},
        {"rule_id": 3, "predicate": "status_class = 5", "sink": "sink_errors"},
        {"rule_id": 4, "predicate": "env = 'prod' AND level = 'WARN'", "sink": "sink_audit"},
    ]
    return pa.Table.from_pylist(rows)


def write_sequences_file(
    path: str, n_rows: int, seed: int = 42, start_row: int = 0
) -> str:
    """One sequences parquet file (chunked writes, bounded RAM,
    small-ish row groups: parquet splits at row-group boundaries, so
    one giant row group would serialize the whole scan into a single
    Spark task regardless of partition count)."""
    rng = np.random.default_rng(seed)
    writer = None
    for start in range(0, n_rows, CHUNK_ROWS):
        chunk = _sequences_chunk(
            rng, start_row + start, min(CHUNK_ROWS, n_rows - start)
        )
        if writer is None:
            writer = pq.ParquetWriter(path, chunk.schema)
        writer.write_table(chunk, row_group_size=16_384)
    if writer is not None:
        writer.close()
    return path


def grow_sequences_file(
    path: str, n_rows: int, seed: int, start_row: int
) -> str:
    """Simulate an IN-PLACE APPEND to an existing sequences parquet
    file (the reference tailer's growth vector: the same file, new
    bytes at the end, prefix unchanged): rewrite ``path`` as its own
    row groups re-encoded byte-identically (same arrays, same writer
    settings, preserved row-group boundaries) followed by ``n_rows``
    freshly synthesized rows. The data-page prefix of the grown file
    equals the old file's, so discovery's head-hash append detection
    sees a pure append — tests assert that property rather than
    assuming it."""
    pf = pq.ParquetFile(path)
    tmp = f"{path}.grow-tmp"
    writer = None
    for rg in range(pf.metadata.num_row_groups):
        t = pf.read_row_group(rg)
        if writer is None:
            writer = pq.ParquetWriter(tmp, t.schema)
        writer.write_table(t, row_group_size=t.num_rows)
    rng = np.random.default_rng(seed)
    for start in range(0, n_rows, CHUNK_ROWS):
        chunk = _sequences_chunk(
            rng, start_row + start, min(CHUNK_ROWS, n_rows - start)
        )
        if writer is None:
            writer = pq.ParquetWriter(tmp, chunk.schema)
        writer.write_table(chunk, row_group_size=16_384)
    writer.close()
    os.replace(tmp, path)
    return path


def append_sequences(
    fix_dir: str, n_rows: int, seed: int, start_row: int, name: str = "part-append"
) -> str:
    """Append a new sequences file to a directory-layout fixture — the
    growing-input vector (reference: a new file appearing under
    log_dir between discovery rescans)."""
    seq_dir = os.path.join(fix_dir, "sequences.parquet")
    assert os.path.isdir(seq_dir), "append requires sequences_as_dir fixture"
    return write_sequences_file(
        os.path.join(seq_dir, f"{name}-{seed}.parquet"), n_rows, seed, start_row
    )


def write_fixture(
    out_dir: str, n_rows: int, seed: int = 42, sequences_as_dir: bool = False
) -> dict[str, str]:
    """Write the three tables as parquet; returns name->path.

    ``sequences_as_dir=True`` writes sequences as a directory of part
    files so tests can grow the input with ``append_sequences``.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    seq_path = os.path.join(out_dir, "sequences.parquet")
    if sequences_as_dir:
        os.makedirs(seq_path, exist_ok=True)
        write_sequences_file(
            os.path.join(seq_path, "part-00000.parquet"), n_rows, seed
        )
    else:
        write_sequences_file(seq_path, n_rows, seed)
    paths["sequences"] = seq_path

    for name, tbl in (
        ("source_meta", make_source_meta()),
        ("route_rules", make_route_rules()),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p, row_group_size=16_384)
        paths[name] = p
    return paths
