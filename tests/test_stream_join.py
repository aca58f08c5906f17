"""Stream-stream watermarked interval join (streaming/joins.py):
inner results must equal the batch run of the SAME function on the
same rows (including matches that span micro-batch boundaries through
join state), and left_outer must emit null-padded rows once the
watermark proves no match can arrive."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ves_spark.streaming.joins import interval_join_streams

BASE = pd.Timestamp("2025-06-01 00:00:00")


def _file(path, rows, id_name):
    """rows: list of (source, minute, id)."""
    tbl = pa.table(
        {
            "source": pa.array([s for s, _, _ in rows], pa.string()),
            "ts": pa.array(
                [BASE + pd.Timedelta(minutes=m) for _, m, _ in rows],
                pa.timestamp("us"),
            ),
            id_name: pa.array([i for _, _, i in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _streams(spark, tmp_path):
    err_dir, ctx_dir = str(tmp_path / "err"), str(tmp_path / "ctx")
    os.makedirs(err_dir)
    os.makedirs(ctx_dir)
    mk = lambda d, idc: (
        spark.readStream.schema(f"source string, ts timestamp, {idc} string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return err_dir, ctx_dir, mk(err_dir, "err_id"), mk(ctx_dir, "req_id")


ERR_B1 = [("a", 20, "e1"), ("b", 30, "e2")]
# c6@48 is context that arrives ONE BATCH BEFORE the error it matches
# (e3@50 in batch 2) — it must survive in join state across the batch
CTX_B1 = [
    ("a", 12, "c1"),
    ("a", 25, "c2"),
    ("b", 29, "c3"),
    ("b", 45, "c4"),
    ("a", 48, "c6"),
]
ERR_B2 = [("a", 50, "e3")]
CTX_B2 = [("a", 41, "c5")]


def test_inner_stream_join_equals_batch(spark, tmp_path):
    err_dir, ctx_dir, errs, ctxs = _streams(spark, tmp_path)
    joined = interval_join_streams(
        errs,
        ctxs,
        keys=["source"],
        before="10 minutes",
        after="0 seconds",
        watermark="10 minutes",
        right_suffix="_ctx",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sjoin")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _file(os.path.join(err_dir, "f1.parquet"), ERR_B1, "err_id")
    _file(os.path.join(ctx_dir, "f1.parquet"), CTX_B1, "req_id")
    q.processAllAvailable()
    _file(os.path.join(err_dir, "f2.parquet"), ERR_B2, "err_id")
    _file(os.path.join(ctx_dir, "f2.parquet"), CTX_B2, "req_id")
    q.processAllAvailable()
    q.stop()
    got = {
        (r["err_id"], r["req_id_ctx"])
        for r in spark.table("t_sjoin").collect()
    }

    # the oracle: the SAME function over batch frames (Catalyst drops
    # the watermark nodes, the join predicate is identical)
    mkb = lambda rows, idc: spark.createDataFrame(
        pd.DataFrame(
            {
                "source": [s for s, _, _ in rows],
                "ts": [BASE + pd.Timedelta(minutes=m) for _, m, _ in rows],
                idc: [i for _, _, i in rows],
            }
        )
    )
    exp_df = interval_join_streams(
        mkb(ERR_B1 + ERR_B2, "err_id"),
        mkb(CTX_B1 + CTX_B2, "req_id"),
        keys=["source"],
        before="10 minutes",
        after="0 seconds",
        watermark="10 minutes",
        right_suffix="_ctx",
    )
    exp = {(r["err_id"], r["req_id_ctx"]) for r in exp_df.collect()}
    # sanity against hand enumeration: cross-batch pair included
    assert {("e3", "c6"), ("e3", "c5"), ("e1", "c1"), ("e2", "c3")} <= exp
    assert got == exp


def test_left_outer_emits_nulls_once_watermark_passes(spark, tmp_path):
    err_dir, ctx_dir, errs, ctxs = _streams(spark, tmp_path)
    joined = interval_join_streams(
        errs,
        ctxs,
        keys=["source"],
        before="10 minutes",
        watermark="10 minutes",
        how="left_outer",
        right_suffix="_ctx",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sjoin_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # e1 matches c1; e2 has NO context inside its lookback
    _file(
        os.path.join(err_dir, "f1.parquet"),
        [("a", 20, "e1"), ("b", 100, "e2")],
        "err_id",
    )
    _file(os.path.join(ctx_dir, "f1.parquet"), [("a", 15, "c1")], "req_id")
    q.processAllAvailable()
    # two far-future flush batches: the first advances the watermark
    # past e2's interval, the next trigger applies the eviction that
    # emits the null-padded row (append mode: emitted exactly once)
    _file(os.path.join(err_dir, "f2.parquet"), [("z", 3000, "flush1")], "err_id")
    _file(os.path.join(ctx_dir, "f2.parquet"), [("z", 3000, "cf1")], "req_id")
    q.processAllAvailable()
    _file(os.path.join(err_dir, "f3.parquet"), [("z", 4000, "flush2")], "err_id")
    _file(os.path.join(ctx_dir, "f3.parquet"), [("z", 4000, "cf2")], "req_id")
    q.processAllAvailable()
    q.stop()

    rows = {
        (r["err_id"], r["req_id_ctx"]) for r in spark.table("t_sjoin_outer").collect()
    }
    assert ("e1", "c1") in rows
    assert ("e2", None) in rows  # unmatched left emitted null-padded
    assert ("e1", None) not in rows  # matched rows never also null-pad


def test_interval_join_validation(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", BASE.to_pydatetime(), "x")],
        "source string, ts timestamp, i string",
    )
    with pytest.raises(ValueError, match="at least one key"):
        interval_join_streams(df, df, keys=[])
    with pytest.raises(ValueError, match="absent"):
        interval_join_streams(df, df, keys=["nope"])
    with pytest.raises(ValueError, match="how"):
        interval_join_streams(df, df, keys=["source"], how="full_outer")
