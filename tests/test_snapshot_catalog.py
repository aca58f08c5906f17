"""LocalSnapshotCatalog — the Iceberg contract double (ICEBERG.md) —
and the pipeline suites on top of it: snapshot-id semantics, atomic
metadata commits, incremental reads, MERGE delegation, and the full
crash/resume + growing-input + rotation lifecycle on BOTH catalogs."""

import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import assert_same_rows
from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.sources.snapshot_catalog import LocalSnapshotCatalog
from ves_spark.synth import write_fixture, write_sequences_file


@pytest.fixture()
def cat(tmp_path):
    return LocalSnapshotCatalog(str(tmp_path))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, part int")


# ------------------------------------------------------------ contract


def test_append_read_roundtrip_and_snapshot_ids(spark, cat):
    assert not cat.exists(spark, "t")
    assert cat.current_snapshot_id("t") is None
    cat.append(_df(spark, [("a", 1, 0)]), "t", ["part"])
    assert cat.exists(spark, "t")
    assert cat.current_snapshot_id("t") == 1
    cat.append(_df(spark, [("b", 2, 1)]), "t", ["part"])
    assert cat.current_snapshot_id("t") == 2
    got = {(r["k"], r["v"], r["part"]) for r in cat.read(spark, "t").collect()}
    assert got == {("a", 1, 0), ("b", 2, 1)}


def test_overwrite_replaces_only_touched_specs(spark, cat):
    cat.append(_df(spark, [("a", 1, 0), ("b", 2, 1)]), "t", ["part"])
    cat.overwrite_partitions(_df(spark, [("a2", 9, 0)]), "t", ["part"])
    got = {(r["k"], r["v"], r["part"]) for r in cat.read(spark, "t").collect()}
    assert got == {("a2", 9, 0), ("b", 2, 1)}  # part=1 untouched


def test_delete_partitions_prefix(spark, cat):
    cat.append(_df(spark, [("a", 1, 0), ("b", 2, 1), ("c", 3, 1)]), "t", ["part"])
    cat.delete_partitions("t", [{"part": 1}])
    got = {(r["k"], r["part"]) for r in cat.read(spark, "t").collect()}
    assert got == {("a", 0)}


def test_orphan_data_dir_is_invisible(spark, cat, tmp_path):
    """Crash between the data write and the metadata commit: the
    orphan dir must not be readable — snapshot isolation."""
    cat.append(_df(spark, [("a", 1, 0)]), "t", ["part"])
    # simulate: write data with NO metadata commit
    orphan = _df(spark, [("ghost", 666, 0)])
    orphan.write.mode("error").partitionBy("part").parquet(
        os.path.join(str(tmp_path), "t", "data", "s99-orphan")
    )
    got = {r["k"] for r in cat.read(spark, "t").collect()}
    assert got == {"a"}


def test_incremental_read_append_ranges(spark, cat):
    cat.append(_df(spark, [("a", 1, 0)]), "t", ["part"])       # snap 1
    cat.append(_df(spark, [("b", 2, 0)]), "t", ["part"])       # snap 2
    cat.append(_df(spark, [("c", 3, 1)]), "t", ["part"])       # snap 3
    inc = cat.read_incremental(spark, "t", start_snapshot_id=1)
    assert {r["k"] for r in inc.collect()} == {"b", "c"}
    inc2 = cat.read_incremental(spark, "t", 1, end_snapshot_id=2)
    assert {r["k"] for r in inc2.collect()} == {"b"}
    # empty range
    assert cat.read_incremental(spark, "t", 3).count() == 0
    # overwrite in range -> raises (Iceberg restriction)
    cat.overwrite_partitions(_df(spark, [("a2", 9, 0)]), "t", ["part"])  # snap 4
    with pytest.raises(ValueError, match="non-append"):
        cat.read_incremental(spark, "t", 2).collect()


def test_merge_upsert_delegates_to_merge_into(spark, cat):
    from ves_spark.operators.upsert import merge_upsert, read_table

    b1 = spark.createDataFrame([("a", 1, 10), ("b", 2, 10)], "k string, v int, o int")
    b2 = spark.createDataFrame([("a", 9, 20), ("c", 3, 5)], "k string, v int, o int")
    merge_upsert(spark, cat, "state", b1, ["k"], "o")
    snap1 = cat.current_snapshot_id("state")
    merge_upsert(spark, cat, "state", b2, ["k"], "o")
    assert cat.current_snapshot_id("state") > snap1  # merged as a new snapshot
    got = {(r["k"], r["v"], r["o"]) for r in read_table(spark, cat, "state").collect()}
    assert got == {("a", 9, 20), ("b", 2, 10), ("c", 3, 5)}


# ----------------------------------------------- pipeline on the double

COLS = ["doc_id", "sink", "source", "n_tok", "tokens"]


def _conf(fix, out, run_id, impl):
    return PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=out,
        n_units=4,
        units_per_increment=2,
        run_id=run_id,
        catalog_impl=impl,
    )


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snapcat_fix"))
    write_fixture(d, 6_000, seed=31, sequences_as_dir=True)
    return d


@pytest.mark.parametrize("impl", ["parquet", "snapshot"])
def test_crash_resume_on_both_catalogs(spark, fix, tmp_path_factory, impl):
    single = Pipeline(
        spark, _conf(fix, str(tmp_path_factory.mktemp(f"s-{impl}")), "s", impl)
    )
    single.run()

    out = str(tmp_path_factory.mktemp(f"c-{impl}"))
    crashy = Pipeline(spark, _conf(fix, out, "a", impl))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashy.run(fail_after_units=2)
    resumed = Pipeline(spark, _conf(fix, out, "b", impl))
    resumed.run()
    assert Pipeline(spark, _conf(fix, out, "c", impl)).run()["units_processed"] == 0
    assert_same_rows(
        resumed.routed().select(*COLS).toPandas(),
        single.routed().select(*COLS).toPandas(),
    )
    agg = ["sink", "source", "time_bucket", "cnt", "sum_n_tok", "sum_bytes"]
    assert_same_rows(
        resumed.finalize_rollup().toPandas()[agg],
        single.finalize_rollup().toPandas()[agg],
    )


@pytest.mark.parametrize("impl", ["parquet", "snapshot"])
def test_growing_and_rotation_on_both_catalogs(
    spark, tmp_path_factory, impl
):
    from ves_spark.synth import append_sequences

    fix = str(tmp_path_factory.mktemp(f"grow-{impl}"))
    write_fixture(fix, 4_000, seed=33, sequences_as_dir=True)
    out = str(tmp_path_factory.mktemp(f"growout-{impl}"))

    Pipeline(spark, _conf(fix, out, "g1", impl)).run()
    append_sequences(fix, 2_000, seed=34, start_row=4_000)
    Pipeline(spark, _conf(fix, out, "g2", impl)).run()

    # rotate the appended file in place
    rotated = os.path.join(fix, "sequences.parquet", "part-append-34.parquet")
    write_sequences_file(rotated, 1_000, seed=35, start_row=50_000)
    p = Pipeline(spark, _conf(fix, out, "g3", impl))
    p.run()

    single = Pipeline(
        spark, _conf(fix, str(tmp_path_factory.mktemp(f"gs-{impl}")), "gs", impl)
    )
    single.run()
    assert_same_rows(
        p.routed().select(*COLS).toPandas(),
        single.routed().select(*COLS).toPandas(),
    )


def test_lineage_carries_real_snapshot_ids(spark, fix, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snapids"))
    p = Pipeline(spark, _conf(fix, out, "sn", "snapshot"))
    p.run()
    lin = p.store.read(spark).filter(F.col("stage") == "route").toPandas()
    cat = p.catalog
    current = cat.current_snapshot_id("routed")
    # every route lineage row names a real committed snapshot id of the
    # routed table (small ints, not wall-clock ms)
    assert (lin["snapshot_id"] >= 1).all()
    assert (lin["snapshot_id"] <= current).all()
    assert lin["snapshot_id"].nunique() >= 2  # one per increment
