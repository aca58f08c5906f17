"""Round-4 regression tests: unified parse contract, watermark-correct
vectorized sessionization, stat-cached discovery, recursive discovery,
lineage schema evolution, compaction locking, and foreachBatch
stale-sink retraction."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ves_spark.checkpoint import LineageStore
from ves_spark.parse import _CONTRACT_MSG, parse_arrow, parse_builtin
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.streaming.stateful import merge_sessions
from ves_spark.synth import write_fixture


# ------------------------------------------------------ parse contract
@pytest.mark.parametrize("impl", [parse_builtin, parse_arrow])
def test_parse_contract_short_sequence_raises(spark, impl):
    """Both parse impls must fail LOUDLY (not NULL-propagate) on a
    sequence with < 3 tokens — same contract, same message text."""
    for bad_tokens in ([7], []):  # too short AND fully empty
        bad = spark.createDataFrame(
            [("d0", [1, 2, 3], 3, "a"), ("d1", bad_tokens, len(bad_tokens), "a")],
            "doc_id string, tokens array<int>, n_tok int, source string",
        )
        with pytest.raises(Exception) as ei:
            impl(bad).select(
                "doc_id", "level_id", "ts_minute", "status_code"
            ).collect()
        # the CONTRACT message, not ANSI's INVALID_ARRAY_INDEX: the
        # guard must evaluate before any element_at can throw
        assert _CONTRACT_MSG in str(ei.value)


@pytest.mark.parametrize("impl", [parse_builtin, parse_arrow])
def test_parse_contract_good_rows_unaffected(spark, impl):
    ok = spark.createDataFrame(
        [("d0", [8, 2, 3, 9], 4, "a")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    row = impl(ok).select("level_id", "ts_minute").collect()[0]
    assert (row["level_id"], row["ts_minute"]) == (0, 2)


# ------------------------------------------- vectorized session merge
def _merge_scalar(starts, lasts, ns, ev_ms, gap_ms):
    """Scalar reference: interval-gap merge, one event at a time."""
    iv = sorted(
        [(int(s), int(e), int(n)) for s, e, n in zip(starts, lasts, ns)]
        + [(int(t), int(t), 1) for t in ev_ms]
    )
    out = []
    for s, e, n in iv:
        if out and s - out[-1][1] <= gap_ms:
            ps, pe, pn = out[-1]
            out[-1] = (ps, max(pe, e), pn + n)
        else:
            out.append((s, e, n))
    return out


def test_merge_sessions_equals_scalar_on_10k_events():
    rng = np.random.default_rng(7)
    # bursty arrivals with occasional big gaps, shuffled (late data)
    deltas = rng.choice([1_000, 10_000, 120_000], size=10_000, p=[0.6, 0.3, 0.1])
    ev = np.cumsum(deltas)
    rng.shuffle(ev)
    gap = 60_000
    s, e, n = merge_sessions(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64), ev, gap
    )
    exp = _merge_scalar([], [], [], ev, gap)
    assert list(zip(s.tolist(), e.tolist(), n.tolist())) == exp
    assert int(n.sum()) == len(ev)


def test_merge_sessions_bridges_prior_split():
    """A late event between two existing sessions bridges them when
    both gaps close — the exact case eager in-batch emission gets
    wrong (append mode can't retract)."""
    starts = np.array([0], dtype=np.int64)
    lasts = np.array([0], dtype=np.int64)
    ns = np.array([1], dtype=np.int64)
    # open session at 45min; late event at 20min bridges 0 <-> 45
    st = np.array([0, 2_700_000], dtype=np.int64)
    en = np.array([0, 2_700_000], dtype=np.int64)
    nn = np.array([1, 1], dtype=np.int64)
    s, e, n = merge_sessions(
        st, en, nn, np.array([1_200_000], dtype=np.int64), 1_800_000
    )
    assert (s.tolist(), e.tolist(), n.tolist()) == ([0], [2_700_000], [3])
    # same inputs but a smaller gap -> the event bridges neither side
    s2, e2, n2 = merge_sessions(
        st, en, nn, np.array([1_200_000], dtype=np.int64), 300_000
    )
    assert len(s2) == 3


def test_stream_sessionize_late_event_bridges_split(spark, tmp_path):
    """End-to-end ADVICE case: an in-batch gap must NOT emit before
    the watermark confirms it — a late event in the NEXT batch can
    legally bridge the split, and append mode could never retract an
    eager emission. gap=30m, watermark=30m."""
    from ves_spark.streaming.stateful import stream_sessionize

    base = pd.Timestamp("2025-06-01 00:00:00")
    seq_dir = str(tmp_path / "ev")
    os.makedirs(seq_dir)

    def feed(name, rows):
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([u for u, _ in rows], pa.int64()),
                    "ts": pa.array(
                        [base + pd.Timedelta(minutes=m) for _, m in rows],
                        pa.timestamp("us"),
                    ),
                }
            ),
            os.path.join(seq_dir, name),
        )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(seq_dir)
    )
    q = (
        stream_sessionize(stream, gap_minutes=30, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_bridge")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # batch 1: u1 at 0 and 45 — an in-batch gap (45 > 30), but the
    # watermark is only at 15 after this batch, so nothing may emit
    feed("f1.parquet", [(1, 0), (1, 45)])
    q.processAllAvailable()
    assert len(spark.table("t_bridge").toPandas()) == 0
    # batch 2: LATE event at minute 20 (above wm=15) bridges the split
    feed("f2.parquet", [(1, 20)])
    q.processAllAvailable()
    # batch 3: advance the watermark far past 45+30 -> flush via timeout
    feed("f3.parquet", [(99, 1000)])
    q.processAllAvailable()
    q.stop()
    got = spark.table("t_bridge").toPandas()
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 1  # ONE merged session, not a retractable split
    r = u1.iloc[0]
    assert (r["session_start"], r["session_end"], int(r["n_events"])) == (
        base,
        base + pd.Timedelta(minutes=45),
        3,
    )


# ----------------------------------------------- discovery: stat cache
def _pipe(spark, tmp_path, seq_dir, **kw):
    from ves_spark.synth import append_sequences

    fix = str(tmp_path / "fix")
    if not os.path.exists(fix):
        write_fixture(fix, 1_000, seed=11, sequences_as_dir=True)
        for i in range(3):  # 4 part files total
            append_sequences(fix, 500, seed=20 + i, start_row=1_000 + 500 * i)
    conf = PipelineConfig(
        sequences_path=seq_dir or os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=str(tmp_path / "out"),
        n_units=4,
        units_per_increment=4,
        **kw,
    )
    return Pipeline(spark, conf), fix


def test_discover_stat_cache_skips_rehash(spark, tmp_path, monkeypatch):
    pipe, fix = _pipe(spark, tmp_path, None)
    pipe.run()

    calls = {"n": 0}
    real = Pipeline._file_fingerprint

    def counting(path, tail_bytes=65536):
        calls["n"] += 1
        return real(path, tail_bytes)

    monkeypatch.setattr(Pipeline, "_file_fingerprint", staticmethod(counting))
    # fresh Pipeline instance (same store): steady-state discover must
    # do ZERO content reads — identity comes from the stat cache
    pipe2, _ = _pipe(spark, tmp_path, None)
    assert pipe2.discover() == []
    assert calls["n"] == 0

    # rewriting a file (content + mtime change) re-hashes and retires
    seq_dir = os.path.join(fix, "sequences.parquet")
    victim = sorted(
        f for f in os.listdir(seq_dir) if f.endswith(".parquet")
    )[0]
    vpath = os.path.join(seq_dir, victim)
    tbl = pq.read_table(vpath)
    pq.write_table(tbl.slice(0, max(1, len(tbl) // 2)), vpath)
    pipe3, _ = _pipe(spark, tmp_path, None)
    work = pipe3.discover()
    assert calls["n"] >= 1  # the changed file was re-hashed
    assert len(work) == 1  # survivors + rewritten file re-ingested as new


# ---------------------------------------------- discovery: recursive
def test_recursive_discovery_matches_flat(spark, tmp_path):
    import shutil

    from ves_spark.synth import append_sequences

    fix = str(tmp_path / "fixr")
    write_fixture(fix, 1_000, seed=13, sequences_as_dir=True)
    for i in range(3):
        append_sequences(fix, 500, seed=30 + i, start_row=1_000 + 500 * i)
    flat = os.path.join(fix, "sequences.parquet")
    # nest the same part files two levels deep (+ decoys that the
    # dotfile/underscore filter must skip at every level)
    nested = str(tmp_path / "nested")
    parts = sorted(f for f in os.listdir(flat) if f.endswith(".parquet"))
    for i, f in enumerate(parts):
        sub = os.path.join(nested, f"day={i % 2}", f"hour={i}")
        os.makedirs(sub, exist_ok=True)
        shutil.copy(os.path.join(flat, f), os.path.join(sub, f))
    os.makedirs(os.path.join(nested, "_temporary"), exist_ok=True)
    with open(os.path.join(nested, "day=0", "_SUCCESS"), "w") as fh:
        fh.write("")

    pipe_n, _ = _pipe(spark, tmp_path / "n", nested)
    files = pipe_n._list_input_files()
    assert len(files) == len(parts)
    assert all("_temporary" not in f and "_SUCCESS" not in f for f in files)

    stats_n = pipe_n.run()
    pipe_f, _ = _pipe(spark, tmp_path / "f", flat)
    stats_f = pipe_f.run()
    assert stats_n["rows_routed"] == stats_f["rows_routed"] > 0

    # recursive=False sees no files one level up (old behavior, opt-in)
    pipe_nr, _ = _pipe(spark, tmp_path / "nr", nested, recursive=False)
    assert pipe_nr._list_input_files() == []


# ------------------------------------------- lineage schema evolution
_OLD_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("stage", pa.string()),
        ("batch_seq", pa.int32()),
        ("unit_id", pa.int32()),
        ("source", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("snapshot_id", pa.int64()),
        ("committed_at", pa.timestamp("us")),
    ]
)


def _old_store_dir(tmp_path):
    """A lineage dir written by the pre-'fingerprint' code."""
    d = str(tmp_path / "old_lineage")
    os.makedirs(d)
    rows = [
        {
            "run_id": "r0",
            "stage": "ingest",
            "batch_seq": 0,
            "unit_id": -1,
            "source": "/in/a.parquet",
            "rows": 0,
            "bytes": 10,
            "snapshot_id": 0,
            "committed_at": pd.Timestamp("2025-01-01").to_pydatetime(),
        },
        {
            "run_id": "r0",
            "stage": "route",
            "batch_seq": 0,
            "unit_id": 1,
            "source": "s1",
            "rows": 5,
            "bytes": 20,
            "snapshot_id": 1,
            "committed_at": pd.Timestamp("2025-01-01").to_pydatetime(),
        },
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_OLD_SCHEMA),
        os.path.join(d, "commit-old0.parquet"),
    )
    return d


def test_lineage_reads_pre_fingerprint_store(spark, tmp_path):
    store = LineageStore(_old_store_dir(tmp_path))
    df = store.read(spark)
    assert "fingerprint" in df.columns
    assert df.filter(df.fingerprint.isNull()).count() == 2
    state, max_seq = store.ingest_state(spark)
    assert max_seq == 0 and state[0] == {"/in/a.parquet": None}
    assert store.committed_units(spark, 0) == {1}


def test_lineage_compacts_mixed_schema_store(spark, tmp_path):
    store = LineageStore(_old_store_dir(tmp_path))
    # new-schema rows land next to the old-schema file
    store.record_ingest(1, ["/in/b.parquet"], "r1", fingerprints={"/in/b.parquet": "9:ab"})
    store.compact()
    files = [f for f in os.listdir(store.path) if f.endswith(".parquet")]
    assert len(files) == 1 and files[0].startswith("compact-")
    state, max_seq = store.ingest_state(spark)
    assert state[1] == {"/in/b.parquet": "9:ab"}
    assert state[0] == {"/in/a.parquet": None}  # old rows survive, nulled


# -------------------------------------------------- compaction locking
def test_compact_lock_held_skips_and_stale_breaks(tmp_path):
    store = LineageStore(str(tmp_path / "lin"), compact_every=1000)
    for i in range(4):
        store.append([{"run_id": "r", "stage": "route", "batch_seq": 0,
                       "unit_id": i, "source": None, "rows": 1, "bytes": 1,
                       "snapshot_id": 0}])
    lock = os.path.join(store.path, ".compact.lock")
    open(lock, "w").close()  # a live competitor holds the lock
    store.compact()
    assert len(store._live_files()) == 4  # skipped, not corrupted
    # stale lock (crashed owner): broken, compaction proceeds
    old = 10_000
    os.utime(lock, (os.path.getmtime(lock) - old, os.path.getmtime(lock) - old))
    store.compact()
    assert len(store._live_files()) == 1
    assert not os.path.exists(lock)  # released


# ------------------------------------- foreachBatch stale-sink cleanup
def test_foreach_batch_retracts_stale_sink_partition(spark, tmp_path):
    """If attempt 1 of batch N wrote sink A and the retry no longer
    routes to A (rules changed across restart), redelivery must
    retract A's _batch_id=N partition — overwrite alone can't."""
    from ves_spark.sources.catalog import ParquetCatalog
    from ves_spark.streaming.stream_pipeline import deliver_to_sinks

    cat = ParquetCatalog(str(tmp_path / "sinks"))
    deliver = deliver_to_sinks(cat)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id string, sink string")  # noqa: E731

    deliver(mk([("d1", "a"), ("d2", "b")]), batch_id=7)
    a_dir = str(tmp_path / "sinks" / "sink_a")
    assert os.path.isdir(os.path.join(a_dir, "_batch_id=7"))
    # retry of the SAME batch id, sink a no longer routed
    deliver(mk([("d2", "b"), ("d3", "b")]), batch_id=7)
    assert not os.path.isdir(os.path.join(a_dir, "_batch_id=7"))
    # other batches' partitions in a are untouched by later batches
    deliver(mk([("d4", "a")]), batch_id=8)
    deliver(mk([("d5", "b")]), batch_id=9)
    assert os.path.isdir(os.path.join(a_dir, "_batch_id=8"))
    b = spark.read.parquet(str(tmp_path / "sinks" / "sink_b"))
    assert b.count() == 3  # batch 7 rewrite (2) + batch 9 (1)


def test_stream_sessionize_microsecond_gap_boundary(spark, tmp_path):
    """Events 1800.0005 s apart must SPLIT (strict > gap) even though
    millisecond truncation would make the delta exactly 1800000 ms and
    merge them — the kernel must work at the events' native
    microsecond precision (testdata timestamps carry sub-ms parts)."""
    from ves_spark.streaming.stateful import stream_sessionize

    base = pd.Timestamp("2025-06-01 00:00:00")
    seq_dir = str(tmp_path / "ev")
    os.makedirs(seq_dir)
    rows = [
        (1, base),
        (1, base + pd.Timedelta(seconds=1800, microseconds=500)),  # split
        (2, base),
        (2, base + pd.Timedelta(seconds=1799, microseconds=999_900)),  # merge
        (99, base + pd.Timedelta(days=30)),  # watermark sentinel
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([u for u, _ in rows], pa.int64()),
                "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
            }
        ),
        os.path.join(seq_dir, "f1.parquet"),
    )
    q = (
        stream_sessionize(
            spark.readStream.schema("user_id long, ts timestamp").parquet(seq_dir),
            gap_minutes=30,
            watermark="30 minutes",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_us_gap")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("t_us_gap").toPandas()
    per_user = got.groupby("user_id").size().to_dict()
    assert per_user.get(1) == 2, f"u1 must split: {got}"
    assert per_user.get(2) == 1, f"u2 must merge: {got}"
    n2 = int(got[got["user_id"] == 2]["n_events"].iloc[0])
    assert n2 == 2


def test_pre_fingerprint_store_adopts_not_retires(spark, tmp_path):
    """Upgrade path: a lineage store written before the fingerprint
    column has fp=None for every ingested file. discover() must ADOPT
    the freshly computed fingerprint (no-op), not treat the mismatch
    as a rotation — that would retire and reprocess every committed
    batch (and transiently delete committed output) on upgrade."""
    pipe, fix = _pipe(spark, tmp_path, None)
    pipe.run()

    # strip the fingerprint column from every lineage file, emulating
    # a store written by the pre-fingerprint code
    lin = pipe.store.path
    for f in os.listdir(lin):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(lin, f))
            t = t.drop_columns(["fingerprint"])
            pq.write_table(t, os.path.join(lin, f))
    os.remove(os.path.join(lin, "statcache.json"))  # force re-hash too

    pipe2, _ = _pipe(spark, tmp_path, None)
    assert pipe2.discover() == []  # adopted: nothing pending
    df = pipe2.store.read(spark)
    assert df.filter(df.stage == "retire").count() == 0
    # and a REAL rotation afterwards is still detected
    seq_dir = os.path.join(fix, "sequences.parquet")
    victim = sorted(f for f in os.listdir(seq_dir) if f.endswith(".parquet"))[0]
    t = pq.read_table(os.path.join(seq_dir, victim))
    pq.write_table(t.slice(0, max(1, len(t) // 2)), os.path.join(seq_dir, victim))
    pipe3, _ = _pipe(spark, tmp_path, None)
    assert len(pipe3.discover()) == 1  # retire + re-ingest as new batch


def test_discover_stat_cache_1k_files_zero_reads(spark, tmp_path, monkeypatch):
    """Verdict-scale check: steady-state discovery over 1,000 input
    files does ZERO content reads (stat cache only). discover() alone
    suffices — the ingest log is written write-ahead on first sight."""
    seq_dir = str(tmp_path / "seq")
    os.makedirs(seq_dir)
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b"], pa.string()),
            "tokens": pa.array([[1, 2, 3], [4, 5, 6]], pa.list_(pa.int32())),
            "n_tok": pa.array([3, 3], pa.int32()),
            "source": pa.array(["s", "s"], pa.string()),
        }
    )
    for i in range(1000):
        pq.write_table(tbl, os.path.join(seq_dir, f"part-{i:05d}.parquet"))

    fix = str(tmp_path / "fixmeta")
    write_fixture(fix, 100, seed=5)
    conf = dict(
        sequences_path=seq_dir,
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=str(tmp_path / "out"),
        n_units=2,
    )
    pipe = Pipeline(spark, PipelineConfig(**conf))
    work = pipe.discover()  # hashes all 1000, records the batch
    assert len(work) == 1 and len(work[0][1]) == 1000

    calls = {"n": 0}
    real = Pipeline._file_fingerprint

    def counting(path, tail_bytes=65536):
        calls["n"] += 1
        return real(path, tail_bytes)

    monkeypatch.setattr(Pipeline, "_file_fingerprint", staticmethod(counting))
    pipe2 = Pipeline(spark, PipelineConfig(**conf))
    work2 = pipe2.discover()
    assert len(work2) == 1 and len(work2[0][1]) == 1000  # still pending
    assert calls["n"] == 0  # and identity came entirely from the cache
