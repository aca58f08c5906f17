"""Crash/resume semantics — the ADR's 'integration tests that simulate
crash and restart scenarios' (reference ADR/Watcher/
000x-checkpoint-store.md:52): kill after k units, resume, assert the
final outputs equal a single-shot run exactly (zero duplicates, zero
losses)."""

import os

import pytest

from tests.conftest import assert_same_rows
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import write_fixture

ROWS = 20_000


def _conf(fix, out, run_id):
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        n_units=8,
        units_per_increment=2,
        run_id=run_id,
    )


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_fixture")
    write_fixture(str(d), ROWS, seed=7)
    return str(d)


def _routed_pdf(p: Pipeline):
    return (
        p.routed()
        .select("doc_id", "sink", "source", "n_tok", "tokens")
        .toPandas()
    )


def test_crash_resume_equals_single_shot(spark, fix, tmp_path_factory):
    single = Pipeline(spark, _conf(fix, str(tmp_path_factory.mktemp("single")), "run-s"))
    single.run()

    out2 = str(tmp_path_factory.mktemp("crashy"))
    crashy = Pipeline(spark, _conf(fix, out2, "run-a"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashy.run(fail_after_units=4)

    committed = crashy.store.committed_units(spark)
    assert 0 < len(committed) < 8

    resumed = Pipeline(spark, _conf(fix, out2, "run-b"))
    stats = resumed.run()
    # zero reprocessing of committed units
    assert stats["units_processed"] == 8 - len(committed)

    assert_same_rows(_routed_pdf(resumed), _routed_pdf(single))

    # third run: everything committed -> no-op (idempotent re-run)
    again = Pipeline(spark, _conf(fix, out2, "run-c"))
    assert again.run()["units_processed"] == 0


def test_rollup_after_resume_matches(spark, fix, tmp_path_factory):
    single = Pipeline(spark, _conf(fix, str(tmp_path_factory.mktemp("s2")), "run-s"))
    single.run()
    out2 = str(tmp_path_factory.mktemp("c2"))
    crashy = Pipeline(spark, _conf(fix, out2, "run-a"))
    with pytest.raises(RuntimeError):
        crashy.run(fail_after_units=2)
    resumed = Pipeline(spark, _conf(fix, out2, "run-b"))
    resumed.run()

    cols = ["sink", "source", "time_bucket", "cnt", "sum_n_tok", "sum_bytes"]
    assert_same_rows(
        resumed.finalize_rollup().toPandas()[cols],
        single.finalize_rollup().toPandas()[cols],
    )


def test_lineage_metrics(spark, fix, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lin"))
    p = Pipeline(spark, _conf(fix, out, "run-m"))
    p.run()
    lin = p.store.read(spark).toPandas()
    # ingest rows (file discovery write-ahead) + route commit rows
    assert set(lin["stage"]) == {"ingest", "route"}
    route_lin = lin[lin["stage"] == "route"]
    assert route_lin["rows"].sum() == p.routed().count()
    # bytes metric = 4 * sum(n_tok) over routed rows (TailerPayload.size analogue)
    import pyspark.sql.functions as F

    sum_bytes = p.routed().select(F.sum(F.col("n_tok").cast("long") * 4)).collect()[0][0]
    assert route_lin["bytes"].sum() == sum_bytes


def test_growing_input_exactly_once(spark, tmp_path_factory):
    """The reference's rescan semantic (discovery.rs:56-87): rows
    appended AFTER a full run are discovered as a new ingest batch and
    processed exactly once — incremental output over the growing input
    equals a single-shot run over the union (zero dupes, zero losses),
    including through a crash mid-second-batch."""
    from ves_spark.synth import append_sequences

    fix = str(tmp_path_factory.mktemp("grow_fix"))
    write_fixture(fix, 8_000, seed=11, sequences_as_dir=True)

    out = str(tmp_path_factory.mktemp("grow_out"))
    p1 = Pipeline(spark, _conf(fix, out, "run-1"))
    assert p1.run()["units_processed"] == 8

    # input grows: a second part file appears
    append_sequences(fix, 6_000, seed=12, start_row=8_000)

    # crash mid-way through the new batch, then resume
    crashy = Pipeline(spark, _conf(fix, out, "run-2"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashy.run(fail_after_units=2)
    resumed = Pipeline(spark, _conf(fix, out, "run-3"))
    stats = resumed.run()
    assert 0 < stats["units_processed"] <= 8  # only batch-1 remainder

    # single-shot over the union (both files present from the start)
    single = Pipeline(
        spark, _conf(fix, str(tmp_path_factory.mktemp("grow_single")), "run-s")
    )
    assert single.run()["units_processed"] == 8  # one batch, union input

    assert_same_rows(_routed_pdf(resumed), _routed_pdf(single))
    cols = ["sink", "source", "time_bucket", "cnt", "sum_n_tok", "sum_bytes"]
    assert_same_rows(
        resumed.finalize_rollup().toPandas()[cols],
        single.finalize_rollup().toPandas()[cols],
    )

    # third run: nothing new -> no-op
    assert Pipeline(spark, _conf(fix, out, "run-4")).run()["units_processed"] == 0


def test_input_scanned_once_per_increment(spark, fix, tmp_path_factory):
    """Regression for the round-1 double-execution bug: lineage metrics
    must come from the written partials, not a second execution of the
    transform. A non-deterministic (hence non-duplicable) counting UDF
    on the input measures how many input rows the transform actually
    processed — exactly once per row."""
    import pandas as pd
    import pyspark.sql.functions as F

    acc = spark.sparkContext.accumulator(0)

    def _count_rows(s: pd.Series) -> pd.Series:
        acc.add(len(s))
        return s

    counted = F.pandas_udf(_count_rows, "int").asNondeterministic()

    orig = Pipeline.transform

    def patched(self, seq):
        return orig(self, seq.withColumn("n_tok", counted("n_tok")))

    out = str(tmp_path_factory.mktemp("once"))
    p = Pipeline(spark, _conf(fix, out, "run-once"))
    try:
        Pipeline.transform = patched
        p.run()
    finally:
        Pipeline.transform = orig
    n_input = spark.read.parquet(os.path.join(fix, "sequences.parquet")).count()
    assert acc.value == n_input, f"input scanned {acc.value / n_input:.2f}x"


def test_relative_vs_absolute_path_no_reingest(spark, fix, tmp_path_factory, monkeypatch):
    """Ingest-file identity must be cwd-independent: running with a
    relative --sequences path and resuming with the absolute one (or
    vice versa) is the SAME input — re-ingesting it as a new batch
    would double-count every row."""
    out = str(tmp_path_factory.mktemp("relabs"))
    seq_abs = os.path.join(fix, "sequences.parquet")

    monkeypatch.chdir(fix)
    conf_rel = _conf(fix, out, "run-rel")
    conf_rel.sequences_path = "sequences.parquet"
    Pipeline(spark, conf_rel).run()

    monkeypatch.chdir("/")
    conf_abs = _conf(fix, out, "run-abs")
    conf_abs.sequences_path = seq_abs
    stats = Pipeline(spark, conf_abs).run()
    assert stats["units_processed"] == 0  # same file, nothing new
