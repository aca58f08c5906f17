"""Streaming rate-spike alerts: the live half of the alerting loop.

``operators/anomaly.py::detect_rate_spikes`` scores a FINISHED rollup
table; the reference's actual operating mode is live tailing
(`src/tailer/manager.rs:21-29` exports rates continuously), so spikes
must be scored as buckets finalize, not in a nightly batch. This
module runs the SAME batch kernel inside a ``foreachBatch`` sink over
the watermarked rollup stream (``stream_rollup``'s append-mode
output), with a compact on-disk baseline state per series.

Why stream == batch EXACTLY (the test's oracle): append mode emits a
window only once its end passes the watermark, and the watermark is
monotone — so per series, buckets are finalized in time order across
micro-batches. Scoring batch N as ``detect_rate_spikes`` over
(baseline state ∪ batch N's buckets) therefore sees precisely the
trailing buckets the all-at-once batch run would see; keeping flags
only for batch N's rows avoids re-emitting state rows.

State is metadata-scale (series × lookback rows, pruned each batch:
a bucket older than ``lookback·width`` before its series' max can
never re-enter any future trailing span, since spans only move right)
and versioned BY BATCH ID: batch N reads ``state_M`` for the largest
committed M < N and writes ``state_N`` + its score partition
``batch_seq=N`` — a redelivered batch recomputes from the same
``state_M`` and overwrites the same outputs, so the sink is
exactly-once under Structured Streaming's replay contract (same
discipline as the pipeline's partition-scoped writes).

100 TB shape: the stream's heavy lifting (the rollup) happened
upstream in the watermarked groupBy; this sink joins two
metadata-sized frames per batch. Nothing here scans events.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ves_spark.operators.anomaly import _time_key, detect_rate_spikes

_STATE_PREFIX = "state_"


def _committed_states(out_dir: str) -> list[int]:
    if not os.path.isdir(out_dir):
        return []
    out = []
    for d in os.listdir(out_dir):
        if d.startswith(_STATE_PREFIX):
            try:
                out.append(int(d[len(_STATE_PREFIX):]))
            except ValueError:
                continue
    return sorted(out)


class SpikeAlertSink:
    """``foreachBatch`` callable: score each finalized rollup bucket
    against its series' trailing baseline, persist the scored rows to
    ``<out_dir>/scores`` (partitioned by batch_seq for idempotent
    redelivery; alerts = the ``is_spike`` filter), and advance the
    baseline state.

    All ``detect_rate_spikes`` knobs pass through; ``bucket_width``
    must match the rollup's window size in seconds.

    ``fill_gaps=True`` additionally raises DROP alerts live: each
    batch densifies (state ∪ batch) with zero buckets out to the
    horizon (the max finalized bucket so far — a silent series can
    only be exposed by the rest of the fleet's clock), scores them,
    and emits every bucket past its series' previous high-water mark
    exactly once. Zero buckets enter the state like real ones, so a
    dead series' baseline decays to flat zero and, matching the batch
    operator, stops alerting once the lookback span has passed —
    bounded alert volume per outage by construction."""

    def __init__(
        self,
        out_dir: str,
        group_cols: list[str],
        time_col: str = "time_bucket",
        value_col: str = "cnt",
        lookback: int = 12,
        bucket_width: int = 300,
        fill_gaps: bool = False,
        **spike_kwargs,
    ):
        self.out_dir = out_dir
        self.group_cols = list(group_cols)
        self.time_col = time_col
        self.value_col = value_col
        self.lookback = lookback
        self.bucket_width = bucket_width
        self.fill_gaps = fill_gaps
        self.spike_kwargs = spike_kwargs
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------ plumbing
    def _state_path(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"{_STATE_PREFIX}{batch_id}")

    def _read_baseline(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        prior = [m for m in _committed_states(self.out_dir) if m < batch_id]
        if not prior:
            return None
        return spark.read.parquet(self._state_path(max(prior)))

    # ------------------------------------------------------ the sink
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return  # empty trigger: no buckets, state unchanged
        cols = [*self.group_cols, self.time_col, self.value_col]
        batch = batch_df.select(*cols)
        baseline = self._read_baseline(spark, batch_id)
        scored_input = batch if baseline is None else baseline.unionByName(batch)

        scored = detect_rate_spikes(
            scored_input,
            self.group_cols,
            time_col=self.time_col,
            value_col=self.value_col,
            lookback=self.lookback,
            bucket_width=self.bucket_width,
            fill_gaps=self.fill_gaps,
            **self.spike_kwargs,
        )
        # Emit each bucket's score exactly once. Without fill: scores
        # for THIS batch's buckets (state rows were scored when they
        # arrived; append mode never re-emits a (series, bucket)), via
        # a semi-join on the full key. With fill: generated zero
        # buckets belong to no batch, so emission is every scored row
        # past its series' previous high-water mark — zeros in
        # (hwm − span, hwm] were emitted last batch and sit in state
        # as explicit rows, so they never regenerate as "new". Every
        # scored row is persisted (not just flags): the score table
        # doubles as the audit trail; alerting is a filter.
        if self.fill_gaps:
            t_key, _ = _time_key(scored, self.time_col)
            scored_k = scored.withColumn("_t_key", t_key)
            if baseline is None:
                scores = scored_k.drop("_t_key")
            else:
                bk, _ = _time_key(baseline, self.time_col)
                hwm = (
                    baseline.withColumn("_t_key", bk)
                    .groupBy(*self.group_cols)
                    .agg(F.max("_t_key").alias("_hwm"))
                )
                scores = (
                    scored_k.join(F.broadcast(hwm), self.group_cols, "left")
                    .filter(
                        F.col("_hwm").isNull()
                        | (F.col("_t_key") > F.col("_hwm"))
                    )
                    .drop("_t_key", "_hwm")
                )
        else:
            scores = scored.join(
                F.broadcast(batch.select(*self.group_cols, self.time_col)),
                [*self.group_cols, self.time_col],
                "semi",
            )
        (
            scores.withColumn("batch_seq", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_seq")
            .parquet(os.path.join(self.out_dir, "scores"))
        )

        # next state: all buckets still inside some future trailing
        # span — t_key > per-series max - lookback*width. Derive from
        # the SCORED rows, not the raw input: under fill_gaps the
        # generated zero buckets must enter the state so (a) future
        # baselines include them and (b) the high-water-mark emission
        # rule sees them as already-emitted.
        span = self.lookback * self.bucket_width
        state_rows = scored.select(*cols)
        t_key, _ = _time_key(state_rows, self.time_col)
        keyed = state_rows.withColumn("_t_key", t_key)
        mx = keyed.groupBy(*self.group_cols).agg(F.max("_t_key").alias("_mx"))
        new_state = (
            keyed.join(F.broadcast(mx), self.group_cols)
            .filter(F.col("_t_key") > F.col("_mx") - F.lit(span))
            .select(*cols)
        )
        tmp = self._state_path(batch_id) + "._tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        new_state.write.mode("overwrite").parquet(tmp)
        final = self._state_path(batch_id)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        # retire states older than the previous one: batch N+1 needs
        # only state_N; keep exactly one predecessor for redelivery
        for m in _committed_states(self.out_dir)[:-2]:
            shutil.rmtree(self._state_path(m), ignore_errors=True)


def read_scores(spark: SparkSession, out_dir: str) -> DataFrame:
    """Every scored bucket emitted so far (batch_seq included)."""
    return spark.read.parquet(os.path.join(out_dir, "scores"))


def read_alerts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Flagged buckets only — the alert feed (spikes, plus drops when
    the sink ran with ``fill_gaps=True``)."""
    sc = read_scores(spark, out_dir)
    flag = F.col("is_spike")
    if "is_drop" in sc.columns:
        flag = flag | F.col("is_drop")
    return sc.filter(flag)
