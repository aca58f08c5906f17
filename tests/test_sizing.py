"""Output-file sizing writer: target-size math, per-file record caps,
range clustering for footer-stat pruning, and the crash-safe
small-files compaction rewrite (sources/sizing.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ves_spark.sources.sizing import (
    compact_small_files,
    estimate_row_bytes,
    write_sized,
)


def _parquet_files(path):
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


@pytest.fixture()
def frame(spark):
    # ~2k rows with an incompressible-ish payload so bytes/row is stable
    return spark.range(2000).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        (F.col("id") % 50).alias("key"),
    )


def test_estimate_row_bytes_positive_and_empty_raises(spark, frame):
    bpr = estimate_row_bytes(frame)
    assert bpr > 0
    with pytest.raises(ValueError):
        estimate_row_bytes(frame.where(F.lit(False)))


def test_write_sized_file_count_and_record_cap(spark, frame, tmp_path):
    out = str(tmp_path / "sized")
    # force multiple files: target ≈ 1/4 of the table's bytes
    bpr = estimate_row_bytes(frame)
    target = int(bpr * 2000 / 4)
    stats = write_sized(frame, out, target_file_bytes=target, n_rows=2000, row_bytes=bpr)
    files = _parquet_files(out)
    # n_files partitions is the floor; maxRecordsPerFile may split a
    # partition whose probe-estimated bytes/row ran slightly under
    assert stats["n_files"] == 4
    assert len(files) >= 4
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # hard cap: no file holds more rows than maxRecordsPerFile
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_file <= stats["rows_per_file"]


def test_write_sized_cluster_cols_gives_disjoint_ranges(spark, frame, tmp_path):
    out = str(tmp_path / "clustered")
    bpr = estimate_row_bytes(frame)
    write_sized(
        frame,
        out,
        target_file_bytes=int(bpr * 2000 / 4),
        n_rows=2000,
        row_bytes=bpr,
        cluster_cols=["id"],
    )
    spans = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(spans) >= 2
    # value-clustered: each file's [lo, hi] is disjoint from the next —
    # a range predicate prunes whole files via parquet footer min/max
    for a, b in zip(spans, spans[1:]):
        assert a["hi"] < b["lo"]


def test_write_sized_empty_frame_writes_schema(spark, frame, tmp_path):
    out = str(tmp_path / "empty")
    stats = write_sized(frame.where(F.lit(False)), out)
    assert stats["rows_per_file"] == 0
    back = spark.read.parquet(out)
    assert back.count() == 0
    # parquet round-trip drops non-nullability; names/types must hold
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in frame.schema.fields
    ]


def test_write_sized_rejects_bad_target(frame, tmp_path):
    with pytest.raises(ValueError):
        write_sized(frame, str(tmp_path / "x"), target_file_bytes=0)


def test_compact_small_files_merges_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # simulate 12 incremental appends → 12+ tiny files
    for i in range(12):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
        ).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path)
    before_rows = sorted(r["id"] for r in before.select("id").collect())
    assert len(_parquet_files(path)) >= 12

    stats = compact_small_files(spark, path, target_file_bytes=64 << 20)
    assert stats["files_before"] >= 12
    assert len(_parquet_files(path)) < stats["files_before"]
    after = spark.read.parquet(path)
    assert sorted(r["id"] for r in after.select("id").collect()) == before_rows
    assert after.schema == before.schema
    # no leftover temp/trash siblings
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if "_compact_" in d or "_trash_" in d]


def test_compact_cluster_cols_passthrough(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    for i in range(4):
        spark.range(i * 500, (i + 1) * 500).select(
            F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
        ).coalesce(1).write.mode("append").parquet(path)
    # tiny target so the compaction produces several range-clustered files
    df = spark.read.parquet(path)
    bpr = estimate_row_bytes(df)
    compact_small_files(
        spark, path, target_file_bytes=int(bpr * 2000 / 4), cluster_cols=["id"]
    )
    spans = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(spans) >= 2
    for a, b in zip(spans, spans[1:]):
        assert a["hi"] < b["lo"]


# ------------------------------------- pipeline-integrated output sizing

from ves_spark.pipeline import Pipeline, PipelineConfig
from ves_spark.synth import write_fixture


@pytest.fixture(scope="module")
def pipe_fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sizing_fix"))
    write_fixture(d, 6_000, seed=77)
    return d


@pytest.mark.parametrize("impl", ["parquet", "snapshot"])
def test_pipeline_target_file_bytes_caps_routed_files(
    spark, pipe_fix, tmp_path_factory, impl
):
    out = str(tmp_path_factory.mktemp(f"sized-{impl}"))
    conf = PipelineConfig(
        sequences_path=os.path.join(pipe_fix, "sequences.parquet"),
        source_meta_path=os.path.join(pipe_fix, "source_meta.parquet"),
        route_rules_path=os.path.join(pipe_fix, "route_rules.parquet"),
        out_dir=out,
        n_units=4,
        units_per_increment=4,
        run_id="sz",
        catalog_impl=impl,
        target_file_bytes=16 << 10,
    )
    pipe = Pipeline(spark, conf)
    stats = pipe.run()
    assert stats["units_processed"] == 4
    cap = pipe._routed_rows_per_file
    assert cap and cap >= 1
    routed = pipe.routed()
    per_file = (
        routed.withColumn("f", F.input_file_name())
        .groupBy("f")
        .count()
        .collect()
    )
    assert all(r["count"] <= cap for r in per_file)
    # unchanged pipeline semantics: idempotent rerun, rollup intact
    assert pipe.run()["units_processed"] == 0
    assert pipe.finalize_rollup().count() > 0

    # the cap actually bit: an uncapped control run of the same input
    # produces fewer, larger files (some over the per-file row cap)
    out2 = str(tmp_path_factory.mktemp(f"unsized-{impl}"))
    ctl = Pipeline(
        spark,
        PipelineConfig(
            sequences_path=os.path.join(pipe_fix, "sequences.parquet"),
            source_meta_path=os.path.join(pipe_fix, "source_meta.parquet"),
            route_rules_path=os.path.join(pipe_fix, "route_rules.parquet"),
            out_dir=out2,
            n_units=4,
            units_per_increment=4,
            run_id="sz0",
            catalog_impl=impl,
        ),
    )
    ctl.run()
    ctl_max = (
        ctl.routed()
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert ctl._routed_rows_per_file is None
    assert ctl_max > cap


def _all_parquet_files(path):
    return sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def test_compact_preserves_hive_partitions(spark, tmp_path):
    """A hive-partitioned table (the catalog's batch_seq=N layout) is
    compacted per leaf partition dir — layout preserved, so the
    directory-based retraction protocol (delete a batch_seq dir) keeps
    working on the compacted table."""
    path = str(tmp_path / "ptbl")
    for b in range(3):
        for _ in range(4):  # 4 small appends per partition
            spark.range(100).select(
                F.lit(b).alias("batch_seq"),
                F.col("id"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            ).coalesce(1).write.mode("append").partitionBy("batch_seq").parquet(path)
    before = spark.read.parquet(path)
    before_pdf = before.orderBy("batch_seq", "id").toPandas()
    files_before = len(_all_parquet_files(path))
    assert files_before >= 12

    stats = compact_small_files(spark, path, target_file_bytes=64 << 20)
    assert stats["partitions_compacted"] == 3
    assert stats["files_before"] == files_before
    assert len(_all_parquet_files(path)) < files_before
    # partition dirs intact, partition column still derived from dirs
    assert sorted(
        d for d in os.listdir(path) if d.startswith("batch_seq=")
    ) == ["batch_seq=0", "batch_seq=1", "batch_seq=2"]
    after = spark.read.parquet(path)
    assert after.orderBy("batch_seq", "id").toPandas().equals(before_pdf)
    # retraction protocol: dropping one partition dir drops exactly it
    import shutil

    shutil.rmtree(os.path.join(path, "batch_seq=1"))
    left = spark.read.parquet(path)
    assert left.count() == 800
    assert sorted(
        r["batch_seq"] for r in left.select("batch_seq").distinct().collect()
    ) == [0, 2]


def test_compact_recovers_from_crash_window(spark, tmp_path):
    """A crash between the two swap renames leaves no live dir but a
    complete sibling; the next compact_small_files call repairs it."""
    import shutil
    import uuid as _uuid

    path = str(tmp_path / "ctbl")
    for i in range(4):
        spark.range(i * 50, (i + 1) * 50).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    rows = sorted(r["id"] for r in spark.read.parquet(path).collect())

    # crash state A: live renamed to trash, compact copy complete
    compact = path + f"._compact_{_uuid.uuid4().hex}"
    shutil.copytree(path, compact)
    trash = path + f"._trash_{_uuid.uuid4().hex}"
    os.rename(path, trash)
    assert not os.path.exists(path)
    compact_small_files(spark, path, target_file_bytes=64 << 20)
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == rows
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if "_compact_" in d or "_trash_" in d]

    # crash state B: only the trash copy survives (crash before the
    # compact write completed was cleaned, live rename already done)
    trash = path + f"._trash_{_uuid.uuid4().hex}"
    os.rename(path, trash)
    compact_small_files(spark, path, target_file_bytes=64 << 20)
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == rows
    assert not [d for d in os.listdir(parent) if "_compact_" in d or "_trash_" in d]

    # crash state C: live intact, stale siblings lying around → removed
    shutil.copytree(path, path + f"._compact_{_uuid.uuid4().hex}")
    shutil.copytree(path, path + f"._trash_{_uuid.uuid4().hex}")
    compact_small_files(spark, path, target_file_bytes=64 << 20)
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == rows
    assert not [d for d in os.listdir(parent) if "_compact_" in d or "_trash_" in d]


def test_compact_crash_recovery_inside_partitioned_table(spark, tmp_path):
    """Same repair, but for a leaf partition dir inside a hive table —
    the missing leaf is found via its sibling markers, not the
    (absent) leaf itself."""
    import shutil
    import uuid as _uuid

    path = str(tmp_path / "ptbl2")
    for b in range(2):
        spark.range(100).select(
            F.lit(b).alias("batch_seq"), F.col("id")
        ).coalesce(1).write.mode("append").partitionBy("batch_seq").parquet(path)
    before = spark.read.parquet(path).orderBy("batch_seq", "id").toPandas()

    leaf = os.path.join(path, "batch_seq=1")
    shutil.copytree(leaf, leaf + f"._compact_{_uuid.uuid4().hex}")
    os.rename(leaf, leaf + f"._trash_{_uuid.uuid4().hex}")
    assert not os.path.exists(leaf)

    compact_small_files(spark, path, target_file_bytes=64 << 20)
    after = spark.read.parquet(path).orderBy("batch_seq", "id").toPandas()
    assert after.equals(before)
    assert not [
        d for d in os.listdir(path) if "_compact_" in d or "_trash_" in d
    ]
