"""Z-order clustering (sources/zorder.py): Morton code correctness vs
a scalar reference, equi-depth bucket balance under skew, and the
payoff claim itself — footer min/max rectangles that prune files on
EITHER clustered dimension, where 1-D clustering prunes only one."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ves_spark.sources.zorder import (
    bucket_of,
    equi_depth_bounds,
    interleave_bits,
    write_zordered,
    zorder_value,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    out = 0
    for d, v in enumerate(vals):
        for j in range(bits):
            out |= ((v >> j) & 1) << (j * len(vals) + d)
    return out


def test_interleave_matches_scalar_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref([r["a"], r["b"]], 8)
    # three dims too
    df3 = spark.createDataFrame([(5, 9, 250)], "a int, b int, c int")
    z3 = df3.select(
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 8).alias("z")
    ).collect()[0]["z"]
    assert z3 == _morton_ref([5, 9, 250], 8)


def test_equi_depth_buckets_balanced_under_skew(spark):
    # heavily skewed values: x^4 concentrates mass near 0
    df = spark.range(20_000).select(
        (F.pow(F.col("id") / 20_000.0, 4.0)).alias("v")
    )
    bounds = equi_depth_bounds(df, "v", 4)  # 16 buckets
    counts = (
        df.select(bucket_of("v", bounds).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    n_per = {r["b"]: r["count"] for r in counts}
    assert len(n_per) == 16
    assert max(n_per.values()) < 3 * min(n_per.values())  # no collapse


def test_bucket_monotone(spark):
    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    bounds = equi_depth_bounds(df, "v", 3)
    rows = (
        df.select("v", bucket_of("v", bounds).alias("b"))
        .orderBy("v")
        .collect()
    )
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)
    assert bs[0] == 0 and bs[-1] == len(bounds)


def _file_ranges(path, cols):
    """per-file (min, max) for each col from parquet footer stats."""
    out = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _overlapping(ranges, box):
    return [
        r
        for r in ranges
        if all(r[c][0] <= hi and r[c][1] >= lo for c, (lo, hi) in box.items())
    ]


def test_zorder_prunes_on_both_dims_where_1d_cannot(spark, tmp_path):
    # two independent uniform dims — the adversarial case for 1-D
    # clustering (x-sorted files each span ALL of y)
    df = (
        spark.range(60_000)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), 10_000).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(2)), 10_000).alias("y"),
        )
    )
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x1d")
    stats = write_zordered(
        df, zpath, ["x", "y"], bits=8, target_file_bytes=1, row_bytes=1.0 / 1500
    )
    assert stats["n_files"] >= 16
    # 1-D control: same file count, range-clustered on x only
    (
        df.repartitionByRange(stats["n_files"], "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    zr = _file_ranges(zpath, ["x", "y"])
    xr = _file_ranges(xpath, ["x", "y"])
    assert len(zr) >= 16 and len(xr) >= 16

    box_y = {"y": (0, 625)}  # ~1/16 of the y space
    # y-predicate: the x-clustered layout cannot prune a single file…
    assert len(_overlapping(xr, box_y)) == len(xr)
    # …the z-ordered layout prunes most of them
    assert len(_overlapping(zr, box_y)) <= len(zr) // 2
    # and an x-predicate still prunes on BOTH layouts
    box_x = {"x": (0, 625)}
    assert len(_overlapping(zr, box_x)) <= len(zr) // 2
    assert len(_overlapping(xr, box_x)) <= max(2, len(xr) // 8)


def test_write_preserves_rows_and_drops_synthetic_col(spark, tmp_path):
    df = spark.range(5_000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 1000).alias("y")
    )
    p = str(tmp_path / "out")
    write_zordered(df, p, ["x", "y"], bits=6, target_file_bytes=1 << 16)
    back = spark.read.parquet(p)
    assert set(back.columns) == {"x", "y"}
    assert back.count() == 5_000
    assert back.select(F.sum("x"), F.sum("y")).collect() == df.select(
        F.sum("x"), F.sum("y")
    ).collect()


def test_bad_args_raise(spark):
    df = spark.range(10).select(F.col("id").alias("x"), F.col("id").alias("y"))
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_value(df, ["x"])
    with pytest.raises(ValueError, match="within a long"):
        zorder_value(df, ["x", "y"], bits=32)


def test_compact_with_zorder_recluster(spark, tmp_path):
    from ves_spark.sources.sizing import compact_small_files

    p = str(tmp_path / "appends")
    # simulate incremental appends: many small commits, no global layout
    base = spark.range(30_000).select(
        F.pmod(F.xxhash64("id", F.lit(7)), 1000).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(8)), 1000).alias("y"),
    )
    for i in range(5):
        base.where(F.pmod(F.col("x") + i, 5) == 0).coalesce(3).write.mode(
            "append"
        ).parquet(p)
    rows_before = spark.read.parquet(p).count()
    stats = compact_small_files(
        spark, p, target_file_bytes=1 << 14, zorder_cols=["x", "y"]
    )
    assert stats["clustered"] == {"zorder": ["x", "y"]}
    assert spark.read.parquet(p).count() == rows_before
    # after the z-ordered rewrite, a y-only box prunes files
    zr = _file_ranges(p, ["x", "y"])
    assert len(zr) >= 8
    assert len(_overlapping(zr, {"y": (0, 62)})) <= len(zr) // 2
    with pytest.raises(ValueError, match="not both"):
        compact_small_files(spark, p, cluster_cols=["x"], zorder_cols=["x", "y"])
