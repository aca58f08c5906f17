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
    assert set(lin["stage"]) == {"route"}
    assert lin["rows"].sum() == p.routed().count()
    # bytes metric = 4 * sum(n_tok) over routed rows (TailerPayload.size analogue)
    import pyspark.sql.functions as F

    sum_bytes = p.routed().select(F.sum(F.col("n_tok").cast("long") * 4)).collect()[0][0]
    assert lin["bytes"].sum() == sum_bytes
