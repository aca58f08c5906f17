"""LineageStore compaction: file count stays bounded as commits grow,
contents are identical through compaction, and every crash window of
the compact protocol (orphan compact file, un-deleted replaced files)
is duplicate-free."""

import json
import os

from ves_spark.checkpoint import LineageStore


def _row(i):
    return {
        "run_id": "r",
        "stage": "route",
        "batch_seq": 0,
        "unit_id": i,
        "source": f"s{i}",
        "rows": 1,
        "bytes": 1,
        "snapshot_id": i,
    }


def _all_rows(spark, store):
    df = store.read(spark)
    return sorted(r["unit_id"] for r in df.collect())


def test_compaction_bounds_files_and_preserves_rows(spark, tmp_path):
    store = LineageStore(str(tmp_path), compact_every=8)
    for i in range(200):
        store.append([_row(i)])
        n_parquet = len([f for f in os.listdir(str(tmp_path)) if f.endswith(".parquet")])
        assert n_parquet <= 9  # compact_every + the just-appended file
    assert _all_rows(spark, store) == list(range(200))
    # exactly one live tombstone chain tail
    live = store._live_files()
    assert len(live) <= 8


def test_orphan_compact_file_is_ignored(spark, tmp_path):
    """Crash between writing compact-*.parquet and its tombstone: the
    orphan must be invisible (otherwise every row in it doubles)."""
    store = LineageStore(str(tmp_path), compact_every=1000)
    for i in range(5):
        store.append([_row(i)])
    # simulate the crash: a compact file exists, tombstone does not
    import shutil

    some_commit = next(
        f for f in os.listdir(str(tmp_path)) if f.startswith("commit-")
    )
    shutil.copy(
        os.path.join(str(tmp_path), some_commit),
        os.path.join(str(tmp_path), "compact-deadbeef.parquet"),
    )
    assert _all_rows(spark, store) == list(range(5))


def test_replaced_files_on_disk_do_not_duplicate(spark, tmp_path):
    """Crash during cleanup (tombstone written, replaced files not yet
    deleted): tombstoned files are dead even while present."""
    store = LineageStore(str(tmp_path), compact_every=1000)
    for i in range(6):
        store.append([_row(i)])
    live_before = store._live_files()
    store.compact()
    # resurrect the replaced files as if deletion never happened
    tomb = store._tombstones()[0]
    assert sorted(tomb["replaces"]) == sorted(live_before)
    # write fake leftovers with the tombstoned names
    src = os.path.join(str(tmp_path), tomb["compact"])
    for name in tomb["replaces"]:
        p = os.path.join(str(tmp_path), name)
        if not os.path.exists(p):
            import shutil

            shutil.copy(src, p)
    assert _all_rows(spark, store) == list(range(6))


def test_pipeline_resume_with_forced_compaction(spark, tmp_path):
    """Crash/resume exactness must survive aggressive compaction
    (compact after every commit)."""
    import pytest

    from tests.conftest import assert_same_rows
    from ves_spark.pipeline import Pipeline, PipelineConfig
    from ves_spark.synth import write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 8_000, seed=13)

    def conf(out, run_id):
        return PipelineConfig(
            sequences_path=os.path.join(fix, "sequences.parquet"),
            source_meta_path=os.path.join(fix, "source_meta.parquet"),
            route_rules_path=os.path.join(fix, "route_rules.parquet"),
            out_dir=out,
            n_units=8,
            units_per_increment=2,
            run_id=run_id,
            lineage_compact_every=2,
        )

    single = Pipeline(spark, conf(str(tmp_path / "single"), "s"))
    single.run()

    out = str(tmp_path / "crashy")
    crashy = Pipeline(spark, conf(out, "a"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashy.run(fail_after_units=4)
    resumed = Pipeline(spark, conf(out, "b"))
    resumed.run()
    assert Pipeline(spark, conf(out, "c")).run()["units_processed"] == 0

    cols = ["doc_id", "sink", "source", "n_tok", "tokens"]
    assert_same_rows(
        resumed.routed().select(*cols).toPandas(),
        single.routed().select(*cols).toPandas(),
    )
