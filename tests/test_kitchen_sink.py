"""Whole-engine composition: every pipeline feature enabled AT ONCE —
content-level exactly-once dedup, target-size routed files, per-commit
lineage compaction, the Arrow parse path, and the KMV/CMS sketch
partials — under a mid-run crash and resume, on both catalog impls.

Each feature has its own focused suite; this one proves they compose.
The contract is the ADR's (reference ADR/Watcher/
000x-checkpoint-store.md:52) lifted to the full feature set: a killed
run, resumed, must be indistinguishable from a single-shot run in
EVERY observable output — routed rows (tokens included), rollups,
sketch estimates, file-size caps — with zero reprocessing of committed
units and an idempotent third run."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from tests.conftest import assert_same_rows
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import write_fixture

N_ROWS = 4_000
N_DUPS = 50
N_UNITS = 6


def _plant_dups(seq_dir: str, n_dups: int) -> None:
    """Re-route the first ``n_dups`` token arrays under new doc_ids in
    a fresh part file — content duplicates the dedup stage must drop."""
    base = pq.read_table(os.path.join(seq_dir, "part-00000.parquet"))
    head = base.slice(0, n_dups)
    dup = pa.table(
        {
            "doc_id": pa.array([f"dup-ks-{i:06d}" for i in range(n_dups)]),
            "tokens": head["tokens"],
            "n_tok": head["n_tok"],
            "source": head["source"],
        }
    )
    pq.write_table(dup, os.path.join(seq_dir, "part-dup-ks.parquet"))


@pytest.fixture(scope="module")
def ks_fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ks_fix"))
    write_fixture(d, N_ROWS, seed=11, sequences_as_dir=True)
    _plant_dups(os.path.join(d, "sequences.parquet"), N_DUPS)
    return d


def _conf(fix: str, out: str, run_id: str, impl: str) -> PipelineConfig:
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        n_units=N_UNITS,
        units_per_increment=2,
        run_id=run_id,
        parse_impl="arrow",
        dedup_content=True,
        target_file_bytes=16 << 10,
        lineage_compact_every=1,
        catalog_impl=impl,
    )


def _routed_pdf(p: Pipeline):
    return (
        p.routed()
        .select("doc_id", "sink", "source", "n_tok", "tokens")
        .toPandas()
    )


def _sample_trigrams(fix: str) -> list[list[int]]:
    toks = pq.read_table(
        os.path.join(fix, "sequences.parquet", "part-00000.parquet"),
        columns=["tokens"],
    )["tokens"]
    first = [int(t) for t in toks[0].as_py()[:3]]
    second = [int(t) for t in toks[1].as_py()[:3]]
    return [first, second, [10**6, 10**6 + 1, 10**6 + 2]]  # last: absent


@pytest.mark.parametrize("impl", ["parquet", "snapshot"])
def test_all_features_crash_resume_equals_single_shot(
    spark, ks_fix, tmp_path_factory, impl
):
    single = Pipeline(
        spark, _conf(ks_fix, str(tmp_path_factory.mktemp(f"ks-s-{impl}")), "ks-s", impl)
    )
    single.run()

    out = str(tmp_path_factory.mktemp(f"ks-c-{impl}"))
    crashy = Pipeline(spark, _conf(ks_fix, out, "ks-a", impl))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashy.run(fail_after_units=3)
    committed = crashy.store.committed_units(spark)
    assert 0 < len(committed) < N_UNITS

    resumed = Pipeline(spark, _conf(ks_fix, out, "ks-b", impl))
    stats = resumed.run()
    assert stats["units_processed"] == N_UNITS - len(committed)

    # 1. routed rows bit-for-bit (token arrays included)
    got, want = _routed_pdf(resumed), _routed_pdf(single)
    assert_same_rows(got, want)

    # 2. content dedup composed: planted copies dropped identically,
    #    and exactly one keeper per duplicated token array survives
    assert (
        got["doc_id"].str.startswith("dup-ks-").sum()
        == want["doc_id"].str.startswith("dup-ks-").sum()
    )
    routed = resumed.routed().select("doc_id", "sink", "tokens")
    per_content = (
        routed.groupBy("sink", F.xxhash64("tokens").alias("h"))
        .agg(F.countDistinct("doc_id").alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_content == 1

    # 3. file sizing composed: every routed data file respects the
    #    learned row cap even across the crash/resume seam
    cap = resumed._routed_rows_per_file
    assert cap and cap >= 1
    per_file = (
        resumed.routed()
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .count()
        .collect()
    )
    assert all(r["count"] <= cap for r in per_file)

    # 4. rollup (count/sum/HDR percentiles) equal to single-shot
    cols = ["sink", "source", "time_bucket", "cnt", "sum_n_tok", "p50", "p95", "p99"]
    assert_same_rows(
        resumed.finalize_rollup().select(*cols).toPandas(),
        single.finalize_rollup().select(*cols).toPandas(),
    )

    # 5. KMV partials merge to the same estimates (deterministic
    #    hashes; the merge dedups docs delivered across batches)
    assert_same_rows(
        resumed.distinct_docs_per_sink().toPandas(),
        single.distinct_docs_per_sink().toPandas(),
    )

    # 6. CMS partials answer trigram queries identically (absent
    #    trigram included — one-sided estimates, same counters)
    tris = _sample_trigrams(ks_fix)
    assert_same_rows(
        resumed.trigram_freq_per_sink(tris).toPandas(),
        single.trigram_freq_per_sink(tris).toPandas(),
    )

    # 7. alerting composes: the gap-filled spike/drop detector scores
    #    the crash/resumed rollup identically to the single-shot one
    from ves_spark.operators.anomaly import detect_rate_spikes

    def _scores(pipe):
        return (
            detect_rate_spikes(
                pipe.finalize_rollup(),
                ["sink", "source"],
                time_col="time_bucket",
                value_col="cnt",
                lookback=12,
                bucket_width=300,
                fill_gaps=True,
            )
            .select(
                "sink", "source", "time_bucket", "cnt", "is_spike", "is_drop"
            )
            .toPandas()
        )

    assert_same_rows(_scores(resumed), _scores(single))

    # 8. idempotent third run: everything committed -> no-op
    again = Pipeline(spark, _conf(ks_fix, out, "ks-c", impl))
    assert again.run()["units_processed"] == 0
