"""File rotation / removal lifecycle (reference FileRotated /
FileRemoved, src/watcher/events.rs:18-65, watcher.rs:35-89): a
rewritten-in-place input file retires its batch's output and is
reprocessed; a removed file's contribution is retracted. After every
mutation, incremental outputs must equal a single-shot run over the
CURRENT state of the input directory."""

import os

import pytest

from tests.conftest import assert_same_rows
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import write_fixture, write_sequences_file

COLS = ["doc_id", "sink", "source", "n_tok", "tokens"]


def _conf(fix, out, run_id):
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        n_units=4,
        units_per_increment=4,
        run_id=run_id,
    )


@pytest.fixture()
def fix(tmp_path):
    d = str(tmp_path / "fix")
    write_fixture(d, 3_000, seed=21, sequences_as_dir=True)
    # second part file so the initial batch has multiple members
    write_sequences_file(
        os.path.join(d, "sequences.parquet", "part-00001.parquet"),
        2_000,
        seed=22,
        start_row=3_000,
    )
    return d


def _single_shot(spark, fix, tmp_path, tag):
    p = Pipeline(spark, _conf(fix, str(tmp_path / f"single-{tag}"), f"s-{tag}"))
    p.run()
    return p.routed().select(*COLS).toPandas()


def test_rotation_and_removal_match_single_shot(spark, fix, tmp_path):
    out = str(tmp_path / "out")
    seq_dir = os.path.join(fix, "sequences.parquet")
    f1 = os.path.join(seq_dir, "part-00001.parquet")

    p = Pipeline(spark, _conf(fix, out, "r0"))
    p.run()

    # grow: third file appears -> new batch (regression: growth still works)
    f2 = os.path.join(seq_dir, "part-00002.parquet")
    write_sequences_file(f2, 1_500, seed=23, start_row=5_000)
    Pipeline(spark, _conf(fix, out, "r1")).run()

    # ROTATE: rewrite part-00001 in place with different content
    write_sequences_file(f1, 1_000, seed=24, start_row=9_000)
    p2 = Pipeline(spark, _conf(fix, out, "r2"))
    p2.run()
    assert_same_rows(
        p2.routed().select(*COLS).toPandas(),
        _single_shot(spark, fix, tmp_path, "rot"),
    )

    # REMOVE: delete part-00002 -> its batch is retracted
    os.remove(f2)
    p3 = Pipeline(spark, _conf(fix, out, "r3"))
    p3.run()
    assert_same_rows(
        p3.routed().select(*COLS).toPandas(),
        _single_shot(spark, fix, tmp_path, "rm"),
    )

    # steady state: nothing changed -> no-op
    assert Pipeline(spark, _conf(fix, out, "r4")).run()["units_processed"] == 0

    # rollup agrees too
    agg_cols = ["sink", "source", "time_bucket", "cnt", "sum_n_tok", "sum_bytes"]
    single = Pipeline(spark, _conf(fix, str(tmp_path / "single-agg"), "sa"))
    single.run()
    assert_same_rows(
        p3.finalize_rollup().toPandas()[agg_cols],
        single.finalize_rollup().toPandas()[agg_cols],
    )


def test_crash_between_retire_delete_and_record(spark, fix, tmp_path):
    """Crash window: partitions deleted but retire row not yet written.
    The trigger condition (changed fingerprint) persists, so the next
    discover retires again and the final state is exact."""
    out = str(tmp_path / "out")
    seq_dir = os.path.join(fix, "sequences.parquet")
    f1 = os.path.join(seq_dir, "part-00001.parquet")

    Pipeline(spark, _conf(fix, out, "c0")).run()
    write_sequences_file(f1, 800, seed=25, start_row=20_000)

    # simulate the crash: delete partitions, skip the retire record
    crashy = Pipeline(spark, _conf(fix, out, "c1"))
    orig = crashy.store.record_retire
    crashy.store.record_retire = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash in retire")
    )
    with pytest.raises(RuntimeError, match="simulated crash in retire"):
        crashy.run()
    crashy.store.record_retire = orig

    resumed = Pipeline(spark, _conf(fix, out, "c2"))
    resumed.run()
    assert_same_rows(
        resumed.routed().select(*COLS).toPandas(),
        _single_shot(spark, fix, tmp_path, "crash"),
    )
