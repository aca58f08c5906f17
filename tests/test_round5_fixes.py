"""Round-5 regression tests: scoped foreachBatch retraction (routed-
sink set, not every prefix-matched table), strict watermark confirm at
the exact session-gap boundary, and compact-lock ownership on release.
"""

import os

import numpy as np
import pandas as pd
import pytest

from ves_spark.checkpoint import LineageStore
from ves_spark.sources.catalog import ParquetCatalog
from ves_spark.streaming.stream_pipeline import deliver_to_sinks


# -------------------------------------- scoped stale-sink retraction
def test_retraction_scoped_to_own_routed_sinks(spark, tmp_path):
    """Two streaming queries sharing a catalog root (batch_id counters
    both start at 0) must never retract each other's partitions: query
    A's batch-0 delivery, which doesn't route to B's sink, must leave
    B's committed batch-0 partition alone."""
    cat = ParquetCatalog(str(tmp_path / "tables"))
    mk = lambda rows: spark.createDataFrame(rows, "doc_id string, sink string")  # noqa: E731

    deliver_b = deliver_to_sinks(cat)
    deliver_b(mk([("d1", "b")]), batch_id=0)
    b_part = str(tmp_path / "tables" / "sink_b" / "_batch_id=0")
    assert os.path.isdir(b_part)

    deliver_a = deliver_to_sinks(cat)  # independent query, same root
    deliver_a(mk([("d2", "a")]), batch_id=0)
    assert os.path.isdir(b_part), "query A retracted query B's partition"

    # A's own redelivery semantics still work within its scope
    deliver_a(mk([("d3", "c")]), batch_id=0)  # retry: now routes to c only
    assert not os.path.isdir(str(tmp_path / "tables" / "sink_a" / "_batch_id=0"))
    assert os.path.isdir(b_part)


def test_retraction_scope_survives_restart(spark, tmp_path):
    """With a routed_state_path (what run_per_sink_delivery passes),
    a post-crash retry in a FRESH process retracts a sink written only
    by the pre-crash attempt — the ever-routed set persists."""
    cat = ParquetCatalog(str(tmp_path / "tables"))
    state = str(tmp_path / "routed.json")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id string, sink string")  # noqa: E731

    deliver1 = deliver_to_sinks(cat, routed_state_path=state)
    deliver1(mk([("d1", "a"), ("d2", "b")]), batch_id=7)
    assert os.path.isdir(str(tmp_path / "tables" / "sink_a" / "_batch_id=7"))

    # "restart": a brand-new closure, same state file; rules changed
    deliver2 = deliver_to_sinks(cat, routed_state_path=state)
    deliver2(mk([("d2", "b"), ("d3", "b")]), batch_id=7)
    assert not os.path.isdir(str(tmp_path / "tables" / "sink_a" / "_batch_id=7"))
    assert spark.read.parquet(str(tmp_path / "tables" / "sink_b")).count() == 2


# ------------------------------- strict confirm at exact gap boundary
class _FakeState:
    """Minimal GroupState double for unit-driving _session_fn."""

    def __init__(self, state_tuple, wm_ms, timed_out=False):
        self._state = state_tuple
        self._wm_ms = wm_ms
        self.hasTimedOut = timed_out
        self.updated = None
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._state is not None

    @property
    def get(self):
        return self._state

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _run_session_fn(state_tuple, wm_ms, gap_us=1_800_000_000):
    from ves_spark.streaming.stateful import _session_fn

    st = _FakeState(state_tuple, wm_ms, timed_out=True)
    out = list(_session_fn(gap_us)((1,), [], st))
    return out, st


def test_session_not_confirmed_at_exact_watermark_boundary():
    """wm == last + gap must NOT emit: an event at ts == wm is still
    admissible (watermark drops only ts < wm) and ts - last == gap
    extends (merge splits only on > gap). Emitting here would be
    premature and unretractable in append mode."""
    gap_us = 1_800_000_000
    en = 1_000_000_000_000_000  # µs, a whole ms so wm can sit exactly on it
    state = ([en - 5_000_000], [en], [3])
    wm_ms = (en + gap_us) // 1_000  # exactly at the deadline

    out, st = _run_session_fn(state, wm_ms, gap_us)
    assert out == [], "session emitted at wm == last + gap"
    assert st.updated is not None, "pending session dropped from state"
    # re-armed timeout must be strictly above the current watermark
    assert st.timeout_ms is not None and st.timeout_ms > wm_ms


def test_session_confirmed_one_ms_past_boundary():
    gap_us = 1_800_000_000
    en = 1_000_000_000_000_000
    state = ([en - 5_000_000], [en], [3])
    wm_ms = (en + gap_us) // 1_000 + 1  # 1 ms past: wm_us > deadline

    out, st = _run_session_fn(state, wm_ms, gap_us)
    assert len(out) == 1 and len(out[0]) == 1
    assert int(out[0]["n_events"].iloc[0]) == 3
    assert st.removed, "confirmed-only state should be removed"


def test_boundary_event_bridges_after_exact_watermark():
    """End-to-end at the boundary: with wm == last + gap the session
    stays pending, and a next-batch event exactly gap after `last`
    (admissible: ts > wm is trivially >= wm) must EXTEND it."""
    from ves_spark.streaming.stateful import _session_fn

    gap_us = 1_800_000_000
    en = 1_000_000_000_000_000
    fn = _session_fn(gap_us)

    st1 = _FakeState(([en], [en], [1]), (en + gap_us) // 1_000, timed_out=True)
    assert list(fn((1,), [], st1)) == []
    starts, lasts, ns = st1.updated

    # the bridging event, exactly at last + gap
    ev = pd.DataFrame({"ts": pd.to_datetime([en + gap_us], unit="us")})
    st2 = _FakeState((starts, lasts, ns), (en + gap_us) // 1_000)
    out = list(fn((1,), [ev], st2))
    assert out == []  # still one open session, now longer
    _, lasts2, ns2 = st2.updated
    assert ns2 == [2] and lasts2 == [en + gap_us]


# ----------------------------------- compact-lock release ownership
def test_slow_compactor_does_not_remove_thiefs_lock(tmp_path):
    """An owner that survives past the staleness window and gets its
    lock stolen (rename + fresh create) must NOT remove the thief's
    lock on release — else a third compactor could run concurrently
    with the thief."""
    store = LineageStore(str(tmp_path / "lineage"), compact_every=1000)
    row = {
        "run_id": "r",
        "stage": "route",
        "unit_id": 0,
        "source": "s0",
        "rows": 1,
        "bytes": 1,
        "snapshot_id": 0,
    }
    store.append([row])
    store.append([dict(row, unit_id=1)])
    lock = os.path.join(store.path, ".compact.lock")

    real_locked = store._compact_locked

    def slow_then_stolen():
        real_locked()
        # simulate the thief winning a stale takeover mid-compaction:
        # our lock is renamed away and a fresh one appears at the path
        os.rename(lock, lock + ".stolen")
        with open(lock, "w") as f:
            f.write("thief")
        os.remove(lock + ".stolen")

    store._compact_locked = slow_then_stolen
    store.compact()
    assert os.path.exists(lock), "owner removed the thief's fresh lock"
    assert open(lock).read() == "thief"
    os.remove(lock)

    # normal path still releases its own lock
    store._compact_locked = real_locked
    store.append([dict(row, unit_id=2)])
    store.compact()
    assert not os.path.exists(lock)


# --------------------------- streaming dedup under redelivered batches
def test_stream_dedup_redelivered_microbatches_match_batch(spark, tmp_path):
    """Injected duplicate micro-batches (the same sequences file
    delivered twice) must not duplicate any sink row: per-sink tables
    after the deduped stream equal the batch pipeline's routing of the
    DISTINCT input, row for row."""
    import shutil

    from pyspark.sql import functions as F

    from ves_spark.enrich import enrich
    from ves_spark.parse import parse_builtin
    from ves_spark.route import route
    from ves_spark.sources.catalog import ParquetCatalog
    from ves_spark.streaming.stream_pipeline import run_per_sink_delivery
    from ves_spark.synth import write_fixture

    base = str(tmp_path)
    fix = os.path.join(base, "fix")
    write_fixture(fix, 2000, seed=7)
    seq_dir = os.path.join(base, "seq")
    os.makedirs(seq_dir)
    # the redelivery: two byte-identical copies = two micro-batches
    shutil.copy(
        os.path.join(fix, "sequences.parquet"),
        os.path.join(seq_dir, "part-0.parquet"),
    )
    shutil.copy(
        os.path.join(fix, "sequences.parquet"),
        os.path.join(seq_dir, "part-1.parquet"),
    )

    cat = ParquetCatalog(os.path.join(base, "tables"))
    run_per_sink_delivery(
        spark,
        seq_dir,
        os.path.join(fix, "source_meta.parquet"),
        os.path.join(fix, "route_rules.parquet"),
        cat,
        os.path.join(base, "ckpt"),
        dedup=True,
    )

    batch_seq = spark.read.parquet(os.path.join(fix, "sequences.parquet"))
    meta = spark.read.parquet(os.path.join(fix, "source_meta.parquet"))
    rules = spark.read.parquet(os.path.join(fix, "route_rules.parquet"))
    routed = route(enrich(parse_builtin(batch_seq), meta), rules)
    exp = {
        r["sink"]: r["count"]
        for r in routed.groupBy("sink").count().collect()
    }
    for sink, cnt in exp.items():
        t = cat.read(spark, f"sink_{sink}")
        assert t.count() == cnt, f"duplicates reached sink {sink}"
        assert (
            t.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
        )


def test_stream_dedup_by_content_drops_renamed_copies(spark, tmp_path):
    """dedup='content': a second micro-batch carrying the SAME token
    arrays under NEW doc_ids is dropped entirely — the streaming
    counterpart of the batch pipeline's dedup_content, keyed by the
    same two-xxhash64 identity, not by doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil

    from pyspark.sql import functions as F

    from ves_spark.sources.catalog import ParquetCatalog
    from ves_spark.streaming.stream_pipeline import run_per_sink_delivery
    from ves_spark.synth import write_fixture

    base = str(tmp_path)
    fix = os.path.join(base, "fix")
    write_fixture(fix, 2000, seed=7)
    seq_dir = os.path.join(base, "seq")
    os.makedirs(seq_dir)
    shutil.copy(
        os.path.join(fix, "sequences.parquet"),
        os.path.join(seq_dir, "part-0.parquet"),
    )
    # renamed redelivery: same contents, fresh doc_ids
    t = pq.read_table(os.path.join(fix, "sequences.parquet"))
    renamed = pa.table(
        {
            "doc_id": pa.array([f"re-{i:08d}" for i in range(t.num_rows)]),
            "tokens": t["tokens"],
            "n_tok": t["n_tok"],
            "source": t["source"],
        }
    )
    pq.write_table(renamed, os.path.join(seq_dir, "part-1.parquet"))

    cat = ParquetCatalog(os.path.join(base, "tables"))
    run_per_sink_delivery(
        spark,
        seq_dir,
        os.path.join(fix, "source_meta.parquet"),
        os.path.join(fix, "route_rules.parquet"),
        cat,
        os.path.join(base, "ckpt"),
        dedup="content",
    )

    # sinks must equal the batch routing of the ORIGINAL file alone:
    # every original row delivered, zero renamed copies admitted
    from ves_spark.enrich import enrich
    from ves_spark.parse import parse_builtin
    from ves_spark.route import route

    batch_seq = spark.read.parquet(os.path.join(fix, "sequences.parquet"))
    meta = spark.read.parquet(os.path.join(fix, "source_meta.parquet"))
    rules = spark.read.parquet(os.path.join(fix, "route_rules.parquet"))
    routed = route(enrich(parse_builtin(batch_seq), meta), rules)
    exp = {
        r["sink"]: r["count"] for r in routed.groupBy("sink").count().collect()
    }
    for sink, cnt in exp.items():
        tbl = cat.read(spark, f"sink_{sink}")
        assert tbl.filter(F.col("doc_id").startswith("re-")).count() == 0
        assert tbl.count() == cnt, f"sink {sink} diverged from batch routing"


# ------------------------------------- k-means centroid training edges
def test_kmeans_training_deterministic_and_empty_cluster_kept(spark):
    """Two identical corpus vectors seed two centroids; every member
    ties to the smaller cent_id, so the other cluster goes EMPTY and
    must keep its previous centroid (the oracle's LEFT JOIN+COALESCE
    rule). Training twice must give bit-identical centroids."""
    from ves_spark.operators.similarity import train_kmeans_centroids

    dim = 8
    v_a = [1.0] + [0.0] * (dim - 1)
    v_b = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [(1, v_a), (2, v_a), (3, v_b), (4, v_b)]
    corpus = spark.createDataFrame(rows, "c_id long, c_vec array<float>")

    c1 = train_kmeans_centroids(corpus, k=4, iters=2, dim=dim)
    c2 = train_kmeans_centroids(corpus, k=4, iters=2, dim=dim)
    assert c1 == c2, "training is not deterministic"

    cents = dict(c1)
    assert set(cents) == {1, 2, 3, 4}
    # each duplicate pair collapses onto the smaller cent_id; the
    # larger one is empty and keeps its seed vector exactly
    assert cents[2] == [float(x) for x in v_a]
    assert cents[4] == [float(x) for x in v_b]
    # the winners hold the (quantized) mean of their two members —
    # identical vectors, so the mean equals the vector within 2^-20
    assert abs(cents[1][0] - 1.0) <= 2**-20 and cents[1][1] == 0.0
    assert abs(cents[3][1] - 1.0) <= 2**-20 and cents[3][0] == 0.0
