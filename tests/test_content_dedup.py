"""Content-level exactly-once in the pipeline (conf.dedup_content):
docs whose token array was already routed by a committed increment are
dropped; the keeper is the globally minimal (batch_seq, unit_id,
doc_id) copy, independent of increment grouping — so crash/resume must
equal single-shot bit-for-bit, and a duplicate arriving in a LATER
batch must be dropped against committed history."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ves_spark.checkpoint import unit_col
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import write_fixture

N_ROWS = 4_000
N_DUPS = 60
N_UNITS = 6


def _plant_dups(seq_dir: str, n_dups: int, tag: str) -> list[str]:
    """Copy the first ``n_dups`` rows of the base part file under NEW
    doc_ids (same token arrays) into a fresh part file; returns the
    new doc_ids."""
    base = pq.read_table(os.path.join(seq_dir, "part-00000.parquet"))
    head = base.slice(0, n_dups)
    new_ids = [f"dup-{tag}-{i:06d}" for i in range(n_dups)]
    dup = pa.table(
        {
            "doc_id": pa.array(new_ids),
            "tokens": head["tokens"],
            "n_tok": head["n_tok"],
            "source": head["source"],
        }
    )
    pq.write_table(dup, os.path.join(seq_dir, f"part-dup-{tag}.parquet"))
    return new_ids


@pytest.fixture(scope="module")
def dup_fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdedup_fix"))
    write_fixture(d, N_ROWS, seed=7, sequences_as_dir=True)
    _plant_dups(os.path.join(d, "sequences.parquet"), N_DUPS, "a")
    return d


def _conf(
    fix: str, out: str, run_id: str, dedup: bool = True, impl: str = "parquet"
) -> PipelineConfig:
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        n_units=N_UNITS,
        units_per_increment=2,
        run_id=run_id,
        dedup_content=dedup,
        catalog_impl=impl,
    )


def _routed_sorted(pipe: Pipeline) -> list[tuple]:
    df = pipe.routed().select(
        "doc_id", "sink", "source", "n_tok", F.hash("tokens").alias("th")
    )
    return sorted(map(tuple, df.collect()))


def _expected_winners(spark, fix: str) -> set[str]:
    """Independent formulation of the keeper rule: per content (both
    hashes), the lowest (unit_id, doc_id) doc wins. One batch here, so
    batch_seq plays no role."""
    seq = (
        spark.read.parquet(os.path.join(fix, "sequences.parquet"))
        .withColumn("unit_id", unit_col(N_UNITS))
        .withColumn("h1", F.xxhash64("tokens"))
        .withColumn("h2", F.xxhash64(F.lit("ves-content-dedup"), "tokens"))
    )
    w = W.partitionBy("h1", "h2").orderBy("unit_id", "doc_id")
    win = seq.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return {r["doc_id"] for r in win.select("doc_id").collect()}


def test_within_batch_dedup_keeps_minimal_copy(spark, dup_fix, tmp_path_factory):
    out_d = str(tmp_path_factory.mktemp("cd_on"))
    out_c = str(tmp_path_factory.mktemp("cd_off"))
    deduped = Pipeline(spark, _conf(dup_fix, out_d, "d", dedup=True))
    stats = deduped.run()
    control = Pipeline(spark, _conf(dup_fix, out_c, "c", dedup=False))
    control.run()

    winners = _expected_winners(spark, dup_fix)
    # dedup run == control run restricted to the independently computed
    # winner set (routing itself is untouched by dedup)
    want = [
        t
        for t in _routed_sorted(control)
        if t[0] in winners
    ]
    assert _routed_sorted(deduped) == want

    # every planted copy lost to its original (originals sort first on
    # doc_id only when units tie; the winner set never shrinks content)
    n_contents = (
        spark.read.parquet(os.path.join(dup_fix, "sequences.parquet"))
        .select(F.xxhash64("tokens").alias("h"))
        .distinct()
        .count()
    )
    assert stats["docs_dropped_dup"] == (N_ROWS + N_DUPS) - n_contents
    # control keeps the duplicate copies it can route
    control_ids = {t[0] for t in _routed_sorted(control)}
    dup_ids = {f"dup-a-{i:06d}" for i in range(N_DUPS)}
    assert control_ids & dup_ids, "control should route some planted dups"


def test_cross_batch_duplicate_dropped_against_history(
    spark, dup_fix, tmp_path_factory
):
    out = str(tmp_path_factory.mktemp("cd_x"))
    first = Pipeline(spark, _conf(dup_fix, out, "r1"))
    first.run()
    routed_before = _routed_sorted(first)

    # batch 2: copies of batch-1 contents ONLY — all must be dropped
    seq_dir = os.path.join(dup_fix, "sequences.parquet")
    _plant_dups(seq_dir, 25, "b")
    try:
        second = Pipeline(spark, _conf(dup_fix, out, "r2"))
        stats = second.run()
        assert stats["units_processed"] > 0  # the new file formed a batch
        assert stats["docs_dropped_dup"] == 25
        assert _routed_sorted(second) == routed_before
    finally:
        os.remove(os.path.join(seq_dir, "part-dup-b.parquet"))


@pytest.mark.parametrize("impl", ["parquet", "snapshot"])
def test_crash_resume_equals_single_shot(spark, dup_fix, tmp_path_factory, impl):
    single = Pipeline(
        spark, _conf(dup_fix, str(tmp_path_factory.mktemp("cd_s")), "s", impl=impl)
    )
    single.run()

    out = str(tmp_path_factory.mktemp("cd_c"))
    crash = Pipeline(spark, _conf(dup_fix, out, "c1", impl=impl))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crash.run(fail_after_units=2)
    resumed = Pipeline(spark, _conf(dup_fix, out, "c2", impl=impl))
    resumed.run()

    assert _routed_sorted(resumed) == _routed_sorted(single)
    # idempotent rerun: nothing pending, nothing dropped
    again = Pipeline(spark, _conf(dup_fix, out, "c3"))
    stats = again.run()
    assert stats["units_processed"] == 0
    assert stats["docs_dropped_dup"] == 0


def test_reused_pipeline_reports_per_run_drops(spark, dup_fix, tmp_path_factory):
    """A long-lived Pipeline in a rescan loop must report each run()'s
    OWN drop count, not the lifetime cumulative."""
    out = str(tmp_path_factory.mktemp("cd_reuse"))
    pipe = Pipeline(spark, _conf(dup_fix, out, "loop"))
    first = pipe.run()
    assert first["docs_dropped_dup"] > 0

    seq_dir = os.path.join(dup_fix, "sequences.parquet")
    _plant_dups(seq_dir, 10, "loop2")
    try:
        second = pipe.run()  # SAME Pipeline object, new increment
        assert second["docs_dropped_dup"] == 10
        assert pipe.dup_docs_dropped == first["docs_dropped_dup"] + 10
    finally:
        os.remove(os.path.join(seq_dir, "part-dup-loop2.parquet"))
