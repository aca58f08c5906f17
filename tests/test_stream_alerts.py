"""Streaming spike alerts (streaming/alerts.py): the foreachBatch sink
must reproduce the batch detect_rate_spikes verdicts EXACTLY for every
finalized bucket, under any micro-batch split, redelivery, and a
mid-stream crash/restart with a fresh sink object."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ves_spark.operators.anomaly import detect_rate_spikes
from ves_spark.streaming.alerts import SpikeAlertSink, read_alerts, read_scores


def _rollup_rows():
    rows = []
    # two noisy series with planted spikes, one flat series
    base = [100, 104, 98, 102, 99, 101, 103, 97, 100, 102] * 3
    for t, v in enumerate(base):
        rows.append(("sink_a", "src1", t * 300, 1000 if t == 20 else v))
        rows.append(("sink_a", "src2", t * 300, 2000 if t == 25 else v + 50))
    for t in range(30):
        rows.append(("sink_b", "src1", t * 300, 450 if t == 15 else 150))
    return rows


def _rollup_df(spark):
    return spark.createDataFrame(
        _rollup_rows(), "sink string, source string, time_bucket long, cnt long"
    )


def _batch_flags(spark):
    got = detect_rate_spikes(
        _rollup_df(spark),
        ["sink", "source"],
        time_col="time_bucket",
        lookback=8,
        bucket_width=300,
    )
    return {
        (r["sink"], r["source"], r["time_bucket"])
        for r in got.collect()
        if r["is_spike"]
    }


def _drive(spark, out, splits):
    """Feed the rollup to the sink as micro-batches split at the given
    time boundaries (append-mode emission is time-ordered, which the
    splits emulate)."""
    sink = SpikeAlertSink(
        str(out), ["sink", "source"], time_col="time_bucket",
        lookback=8, bucket_width=300,
    )
    df = _rollup_df(spark)
    lo = 0
    for bid, hi in enumerate([*splits, 10**9]):
        sink(df.filter((F.col("time_bucket") >= lo * 300) & (F.col("time_bucket") < hi * 300)), bid)
        lo = hi
    return sink


@pytest.mark.parametrize("splits", [[], [10, 20], [3, 7, 11, 19, 23, 27]])
def test_stream_scores_equal_batch(spark, tmp_path, splits):
    _drive(spark, tmp_path / f"al{len(splits)}", splits)
    out = str(tmp_path / f"al{len(splits)}")
    got = {
        (r["sink"], r["source"], r["time_bucket"])
        for r in read_alerts(spark, out).collect()
    }
    assert got == _batch_flags(spark)
    # every bucket was scored exactly once across all micro-batches
    scores = read_scores(spark, out)
    assert scores.count() == len(_rollup_rows())
    assert scores.select("sink", "source", "time_bucket").distinct().count() == len(
        _rollup_rows()
    )


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "redeliver")
    sink = SpikeAlertSink(
        out, ["sink", "source"], time_col="time_bucket",
        lookback=8, bucket_width=300,
    )
    df = _rollup_df(spark)
    b0 = df.filter(F.col("time_bucket") < 15 * 300)
    b1 = df.filter(F.col("time_bucket") >= 15 * 300)
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # Structured Streaming replay after a sink crash
    got = {
        (r["sink"], r["source"], r["time_bucket"])
        for r in read_alerts(spark, out).collect()
    }
    assert got == _batch_flags(spark)
    assert read_scores(spark, out).count() == len(_rollup_rows())


def test_crash_restart_resumes_from_state(spark, tmp_path):
    """A NEW sink object on the same out_dir (driver restart) must pick
    up the persisted baseline, not rescore from nothing."""
    out = str(tmp_path / "restart")
    df = _rollup_df(spark)
    s1 = SpikeAlertSink(
        out, ["sink", "source"], time_col="time_bucket",
        lookback=8, bucket_width=300,
    )
    s1(df.filter(F.col("time_bucket") < 18 * 300), 0)
    s2 = SpikeAlertSink(
        out, ["sink", "source"], time_col="time_bucket",
        lookback=8, bucket_width=300,
    )
    s2(df.filter(F.col("time_bucket") >= 18 * 300), 1)
    got = {
        (r["sink"], r["source"], r["time_bucket"])
        for r in read_alerts(spark, out).collect()
    }
    assert got == _batch_flags(spark)
    # state stays metadata-scale: <= lookback buckets per series kept
    states = [d for d in os.listdir(out) if d.startswith("state_")]
    st = spark.read.parquet(os.path.join(out, sorted(states)[-1]))
    per_series = st.groupBy("sink", "source").count().agg(F.max("count")).collect()[0][0]
    assert per_series <= 8


def test_empty_trigger_is_noop(spark, tmp_path):
    out = str(tmp_path / "empty")
    sink = SpikeAlertSink(
        out, ["sink", "source"], time_col="time_bucket",
        lookback=8, bucket_width=300,
    )
    df = _rollup_df(spark)
    sink(df.filter(F.col("time_bucket") < 10 * 300), 0)
    sink(df.limit(0), 1)  # empty trigger
    sink(df.filter(F.col("time_bucket") >= 10 * 300), 2)
    got = {
        (r["sink"], r["source"], r["time_bucket"])
        for r in read_alerts(spark, out).collect()
    }
    assert got == _batch_flags(spark)


def test_live_stream_end_to_end(spark, tmp_path):
    """The real Structured Streaming wiring: events file-stream →
    watermarked stream_rollup → foreachBatch(SpikeAlertSink). The
    planted burst minute must be flagged, quiet minutes must not."""
    import pyspark.sql.types as T

    from ves_spark.streaming.stream_pipeline import stream_rollup

    src = str(tmp_path / "ev_src")
    rows = []
    # 40 five-minute buckets of steady rate 20, one burst bucket of 200
    for b in range(40):
        n = 200 if b == 30 else 20
        for i in range(n):
            rows.append((f"d{b}_{i}", "src1", "sink_a", 10, b * 300 + (i % 300)))
    df = spark.createDataFrame(
        rows, "doc_id string, source string, sink string, n_tok int, off long"
    ).select(
        "doc_id", "source", "sink", "n_tok",
        (F.lit("2025-01-01 00:00:00").cast("timestamp") + F.col("off").cast("long").cast("interval second")).alias("ts"),
    )
    df.orderBy("ts").coalesce(1).write.parquet(src)
    # sentinel far-future row advances the watermark past every bucket
    last = df.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [("zz", "src1", "sink_a", 1)], "doc_id string, source string, sink string, n_tok int"
    ).select("*", F.lit(last).cast("timestamp").alias("ts")).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 2 DAYS")
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "alerts_out")
    sink = SpikeAlertSink(
        out, ["sink", "source"], time_col="time_bucket",
        value_col="cnt", lookback=8, bucket_width=300,
    )
    stream = (
        spark.readStream.schema(
            T.StructType()
            .add("doc_id", "string").add("source", "string")
            .add("sink", "string").add("n_tok", "integer")
            .add("ts", "timestamp")
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rolled = stream_rollup(stream, watermark="10 minutes")
    q = (
        rolled.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    alerts = read_alerts(spark, out).collect()
    burst_minute = {r["time_bucket"].minute + 60 * r["time_bucket"].hour for r in alerts}
    assert burst_minute == {30 * 5}  # exactly the planted burst bucket


def _gap_rows():
    rows = []
    # svc_dead stops at t=14; svc_live keeps the horizon advancing
    rows += [("sink_a", "src_dead", t * 300, 100 + (t % 3)) for t in range(15)]
    rows += [("sink_a", "src_live", t * 300, 100 + (t % 3)) for t in range(30)]
    return rows


def _gap_df(spark):
    return spark.createDataFrame(
        _gap_rows(), "sink string, source string, time_bucket long, cnt long"
    )


def _batch_fill_rows(spark):
    got = detect_rate_spikes(
        _gap_df(spark), ["sink", "source"],
        time_col="time_bucket", lookback=8, bucket_width=300, fill_gaps=True,
    )
    return {
        (r["sink"], r["source"], r["time_bucket"]): (r["is_spike"], r["is_drop"])
        for r in got.collect()
    }


@pytest.mark.parametrize("splits", [[], [7, 16, 22]])
def test_fill_gaps_stream_equals_batch(spark, tmp_path, splits):
    out = str(tmp_path / f"fg{len(splits)}")
    sink = SpikeAlertSink(
        out, ["sink", "source"], time_col="time_bucket",
        lookback=8, bucket_width=300, fill_gaps=True,
    )
    df = _gap_df(spark)
    lo = 0
    for bid, hi in enumerate([*splits, 10**9]):
        sink(
            df.filter(
                (F.col("time_bucket") >= lo * 300)
                & (F.col("time_bucket") < hi * 300)
            ),
            bid,
        )
        lo = hi
    got = {
        (r["sink"], r["source"], r["time_bucket"]): (r["is_spike"], r["is_drop"])
        for r in read_scores(spark, out).collect()
    }
    assert got == _batch_fill_rows(spark)
    # drop alerts fired for the dead series' first silent buckets
    drops = {k for k, (_s, d) in got.items() if d}
    assert ("sink_a", "src_dead", 15 * 300) in drops
    assert all(s == "src_dead" for (_k, s, _t) in drops)
    # each (series, bucket) emitted exactly once across batches
    sc = read_scores(spark, out)
    assert (
        sc.count()
        == sc.select("sink", "source", "time_bucket").distinct().count()
    )


def test_fill_gaps_stream_redelivery_idempotent(spark, tmp_path):
    out = str(tmp_path / "fgr")
    sink = SpikeAlertSink(
        out, ["sink", "source"], time_col="time_bucket",
        lookback=8, bucket_width=300, fill_gaps=True,
    )
    df = _gap_df(spark)
    b0 = df.filter(F.col("time_bucket") < 18 * 300)
    b1 = df.filter(F.col("time_bucket") >= 18 * 300)
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay
    got = {
        (r["sink"], r["source"], r["time_bucket"]): (r["is_spike"], r["is_drop"])
        for r in read_scores(spark, out).collect()
    }
    assert got == _batch_fill_rows(spark)
