"""Append-only fast path for grown files — the reference tailer's
core semantic: "reads only new bytes from the source … without
re-opening" (src/tailer/models.rs:84-86, src/tailer/reader.rs:30-42).
A file whose head is unchanged but whose size and row count grew is
ingested INCREMENTALLY (only the new row range, as a new batch) rather
than retired and reprocessed — N appends process O(total) rows
overall, not O(total^2). Everything else (rewrite, truncation,
removal) still takes the rotation/retire path."""

import os

import pytest

from tests.conftest import assert_same_rows
from ves_spark.checkpoint import fp_parts
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import (
    grow_sequences_file,
    write_fixture,
    write_sequences_file,
)

COLS = ["doc_id", "sink", "source", "n_tok", "tokens"]
N0 = 3_000


def _conf(fix, out, run_id, **kw):
    kw.setdefault("n_units", 4)
    kw.setdefault("units_per_increment", 4)
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        run_id=run_id,
        **kw,
    )


@pytest.fixture()
def fix(tmp_path):
    # sequences as a SINGLE FILE: the grown-in-place case
    d = str(tmp_path / "fix")
    write_fixture(d, N0, seed=31)
    return d


def _single_shot(spark, fix, tmp_path, tag):
    p = Pipeline(spark, _conf(fix, str(tmp_path / f"single-{tag}"), f"s-{tag}"))
    p.run()
    return p


def test_grow_preserves_prefix_and_detects_append(fix):
    """The synth grow helper must actually produce the append shape
    the detector keys on — otherwise every 'append' test below would
    silently exercise the rotation path instead."""
    f = os.path.join(fix, "sequences.parquet")
    before = fp_parts(Pipeline._file_fingerprint(f))
    grow_sequences_file(f, 1_000, seed=77, start_row=N0)
    after = fp_parts(Pipeline._file_fingerprint(f))
    assert after.head == before.head  # first 64 KiB byte-identical
    assert after.size > before.size
    assert before.nrows == N0 and after.nrows == N0 + 1_000
    assert Pipeline._append_boundary_ok(f, before.nrows)


def test_appends_process_only_new_rows(spark, fix, tmp_path):
    """Three appends; each run must (a) route exactly the new rows,
    (b) never retire the original batch, (c) leave the routed table
    equal to a single-shot run over the current file, and (d) keep the
    lifetime sum of lineage route-rows equal to the routed table size
    — the O(total)-overall assertion."""
    out = str(tmp_path / "out")
    f = os.path.join(fix, "sequences.parquet")

    Pipeline(spark, _conf(fix, out, "a0")).run()
    prev_total = _single_shot(spark, fix, tmp_path, "g0").routed().count()

    for i, n_new in enumerate((1_000, 700, 500)):
        start = N0 + sum((1_000, 700, 500)[:i])
        grow_sequences_file(f, n_new, seed=80 + i, start_row=start)
        p = Pipeline(spark, _conf(fix, out, f"a{i + 1}"))
        stats = p.run()

        single = _single_shot(spark, fix, tmp_path, f"g{i + 1}")
        total = single.routed().count()
        # (a) this run routed exactly the appended rows' contribution
        assert stats["rows_routed"] == total - prev_total > 0
        prev_total = total

        lin = p.store.read(spark)
        # (b) the append path never retires
        assert lin.filter(lin.stage == "retire").count() == 0
        # the new batch reads a pipeline-owned extract, not the input
        ing = {
            r["source"]
            for r in lin.filter(lin.stage == "ingest").select("source").collect()
        }
        assert any(os.sep + "appends" + os.sep in s for s in ing)
        # (c) incremental == single-shot, bit-for-bit row sets
        assert_same_rows(
            p.routed().select(*COLS).toPandas(),
            single.routed().select(*COLS).toPandas(),
        )
        # (d) lifetime route-rows == routed table size: nothing was
        # ever processed twice
        from pyspark.sql import functions as F

        routed_rows = (
            lin.filter(lin.stage == "route").agg(F.sum("rows")).first()[0]
        )
        assert int(routed_rows) == total

    # steady state after the appends: no-op
    assert Pipeline(spark, _conf(fix, out, "a9")).run()["units_processed"] == 0


def test_append_crash_resume_equals_single_shot(spark, fix, tmp_path):
    out = str(tmp_path / "out")
    f = os.path.join(fix, "sequences.parquet")
    Pipeline(spark, _conf(fix, out, "c0")).run()
    grow_sequences_file(f, 1_200, seed=91, start_row=N0)

    crashy = Pipeline(
        spark, _conf(fix, out, "c1", units_per_increment=1)
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashy.run(fail_after_units=1)
    resumed = Pipeline(spark, _conf(fix, out, "c2"))
    resumed.run()
    assert_same_rows(
        resumed.routed().select(*COLS).toPandas(),
        _single_shot(spark, fix, tmp_path, "crash").routed().select(*COLS).toPandas(),
    )


def test_rewrite_still_rotates(spark, fix, tmp_path):
    """A genuine rewrite (different content, head changed) must take
    the retire + re-ingest path, appends notwithstanding."""
    out = str(tmp_path / "out")
    f = os.path.join(fix, "sequences.parquet")
    p0 = Pipeline(spark, _conf(fix, out, "r0"))
    p0.run()
    write_sequences_file(f, 2_000, seed=55, start_row=50_000)
    p1 = Pipeline(spark, _conf(fix, out, "r1"))
    p1.run()
    lin = p1.store.read(spark)
    assert lin.filter(lin.stage == "retire").count() >= 1
    assert_same_rows(
        p1.routed().select(*COLS).toPandas(),
        _single_shot(spark, fix, tmp_path, "rw").routed().select(*COLS).toPandas(),
    )


def test_append_then_rotation_retires_append_batches_too(spark, fix, tmp_path):
    """Retire closure: once a file that previously appended is
    rewritten, BOTH the original batch and every append batch derived
    from it retire — a surviving extract would double its rows."""
    out = str(tmp_path / "out")
    f = os.path.join(fix, "sequences.parquet")
    Pipeline(spark, _conf(fix, out, "x0")).run()
    grow_sequences_file(f, 800, seed=92, start_row=N0)
    Pipeline(spark, _conf(fix, out, "x1")).run()
    # now rewrite the whole file
    write_sequences_file(f, 1_500, seed=93, start_row=90_000)
    p2 = Pipeline(spark, _conf(fix, out, "x2"))
    p2.run()
    lin = p2.store.read(spark)
    assert lin.filter(lin.stage == "retire").count() >= 2  # batch 0 + append
    assert_same_rows(
        p2.routed().select(*COLS).toPandas(),
        _single_shot(spark, fix, tmp_path, "ar").routed().select(*COLS).toPandas(),
    )


def test_deleted_extract_is_repaired(spark, fix, tmp_path):
    """An extract file lost AFTER its batch committed retires that
    batch; the next discover re-detects the rows as an append of the
    original and converges back to single-shot equality."""
    out = str(tmp_path / "out")
    f = os.path.join(fix, "sequences.parquet")
    Pipeline(spark, _conf(fix, out, "d0")).run()
    grow_sequences_file(f, 900, seed=94, start_row=N0)
    Pipeline(spark, _conf(fix, out, "d1")).run()
    appends_dir = os.path.join(out, "appends")
    victims = [x for x in os.listdir(appends_dir) if x.endswith(".parquet")]
    assert victims
    for v in victims:
        os.remove(os.path.join(appends_dir, v))
    p2 = Pipeline(spark, _conf(fix, out, "d2"))
    p2.run()
    assert_same_rows(
        p2.routed().select(*COLS).toPandas(),
        _single_shot(spark, fix, tmp_path, "del").routed().select(*COLS).toPandas(),
    )


def test_boundary_misaligned_is_not_an_append(tmp_path):
    """lo mid-row-group -> not a clean append (metadata-only check)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    tbl = pa.table({"a": list(range(30))})
    w = pq.ParquetWriter(p, tbl.schema)
    for i in range(3):
        w.write_table(tbl.slice(i * 10, 10), row_group_size=10)
    w.close()
    assert Pipeline._append_boundary_ok(p, 10)
    assert Pipeline._append_boundary_ok(p, 20)
    assert Pipeline._append_boundary_ok(p, 30)
    assert not Pipeline._append_boundary_ok(p, 15)
