"""Rate-spike detection (operators/anomaly.py): planted spikes
flagged, quiet series clean, flat-baseline ratio fallback, warm-up
guard, and a verbatim DuckDB window-SQL oracle for the whole score."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ves_spark.operators.anomaly import detect_rate_spikes


def _series(spark):
    rows = []
    # noisy-but-quiet series with one planted 10x spike at t=20
    base = [100, 104, 98, 102, 99, 101, 103, 97, 100, 102] * 3
    for t, v in enumerate(base):
        rows.append(("svc_a", t, 1000 if t == 20 else v))
    # flat series that triples at t=15
    for t in range(30):
        rows.append(("svc_flat", t, 150 if t == 15 else 50))
    # genuinely quiet series
    for t in range(30):
        rows.append(("svc_quiet", t, 200 + (t % 2)))
    return spark.createDataFrame(rows, "sink string, t int, cnt long")


def _flags(df):
    return {
        (r["sink"], r["t"]) for r in df.collect() if r["is_spike"]
    }


def test_planted_spike_flagged_quiet_series_clean(spark):
    got = detect_rate_spikes(
        _series(spark), ["sink"], time_col="t", lookback=8
    )
    flags = _flags(got)
    assert ("svc_a", 20) in flags
    assert ("svc_flat", 15) in flags  # flat-baseline ratio fallback
    assert all(s != "svc_quiet" for s, _ in flags)
    # the spike must not poison later buckets into flags
    assert all(not (s == "svc_a" and t != 20) for s, t in flags)


def test_warmup_not_flagged(spark):
    df = spark.createDataFrame(
        [("s", 0, 5), ("s", 1, 500), ("s", 2, 500_000)],
        "sink string, t int, cnt long",
    )
    got = detect_rate_spikes(df, ["sink"], time_col="t", lookback=8)
    assert _flags(got) == set()  # < min_baseline predecessors everywhere


def test_matches_duckdb_window_sql(spark):
    sdf = detect_rate_spikes(
        _series(spark), ["sink"], time_col="t", lookback=8
    ).select("sink", "t", "cnt", "base_mean", "base_std", "z", "is_spike")
    got = {
        (r["sink"], r["t"]): (
            None if r["z"] is None else round(r["z"], 9),
            r["is_spike"],
        )
        for r in sdf.collect()
    }

    pdf = _series(spark).toPandas()
    con = duckdb.connect()
    con.register("rollup", pdf)
    duck = con.execute(
        """
        WITH w AS (
          SELECT sink, t, cnt,
                 count(cnt) OVER win AS base_n,
                 avg(CAST(cnt AS DOUBLE)) OVER win AS base_mean,
                 sqrt(var_pop(CAST(cnt AS DOUBLE)) OVER win) AS base_std
          FROM rollup
          WINDOW win AS (PARTITION BY sink ORDER BY t
                         RANGE BETWEEN 8 PRECEDING AND 1 PRECEDING)
        )
        SELECT sink, t,
               CASE WHEN base_n >= 3 AND base_std > 0
                    THEN (CAST(cnt AS DOUBLE) - base_mean) / base_std END AS z,
               CASE WHEN base_n < 3 THEN FALSE ELSE
                 coalesce((CAST(cnt AS DOUBLE) - base_mean) / base_std >= 4.0
                          AND base_std > 0, FALSE)
                 OR (base_std = 0 AND base_mean > 0
                     AND CAST(cnt AS DOUBLE) >= base_mean * 3.0)
               END AS is_spike
        FROM w
        """
    ).fetchall()
    exp = {
        (s, t): (None if z is None else round(z, 9), bool(f))
        for s, t, z, f in duck
    }
    assert got == exp


def test_bad_lookback_raises(spark):
    with pytest.raises(ValueError, match="lookback"):
        detect_rate_spikes(
            _series(spark), ["sink"], time_col="t", lookback=2
        )


def test_idle_gap_does_not_score_against_stale_baseline(spark):
    """Rollups only hold buckets with events. A service that resumes
    after a long idle gap must NOT be z-scored against pre-gap rows as
    if adjacent (a restart burst after downtime is the classic false
    positive of a rows-based trailing frame)."""
    rows = [("svc_gap", t, 100 + (t % 3)) for t in range(10)]
    rows.append(("svc_gap", 100, 1000))  # resumes far past the lookback span
    df = spark.createDataFrame(rows, "sink string, t int, cnt long")
    got = detect_rate_spikes(df, ["sink"], time_col="t", lookback=8)
    by_t = {r["t"]: r for r in got.collect()}
    assert by_t[100]["base_n"] == 0  # nothing within (100-8, 100)
    assert not by_t[100]["is_spike"]
    # and the same burst IS flagged when it arrives adjacent to history
    adj = spark.createDataFrame(
        rows[:10] + [("svc_gap", 10, 1000)], "sink string, t int, cnt long"
    )
    got_adj = detect_rate_spikes(adj, ["sink"], time_col="t", lookback=8)
    assert {r["t"] for r in got_adj.collect() if r["is_spike"]} == {10}


def test_timestamp_bucket_width(spark):
    """Timestamp time_col: bucket_width is seconds between buckets; the
    range frame spans lookback*width seconds of trailing history."""
    rows = [("s", f"2025-01-01 00:{5*t:02d}:00", 100) for t in range(8)]
    rows.append(("s", "2025-01-01 00:40:00", 1200))
    df = spark.createDataFrame(
        rows, "sink string, ts string, cnt long"
    ).select("sink", F.to_timestamp("ts").alias("ts"), "cnt")
    got = detect_rate_spikes(
        df, ["sink"], time_col="ts", lookback=6, bucket_width=300
    )
    spikes = [r for r in got.collect() if r["is_spike"]]
    assert len(spikes) == 1 and spikes[0]["ts"].minute == 40
    assert spikes[0]["base_n"] == 6  # exactly the 6 in-span buckets


def test_fill_gaps_detects_rate_drop(spark):
    """A service that goes silent emits NO rollup rows — only the
    filled zero buckets can flag it. The global-max horizon exposes
    the stopped series against the still-running one."""
    rows = [("svc_dead", t, 100 + (t % 3)) for t in range(20)]  # stops at t=19
    rows += [("svc_live", t, 100 + (t % 3)) for t in range(30)]  # keeps going
    df = spark.createDataFrame(rows, "sink string, t int, cnt long")
    got = detect_rate_spikes(
        df, ["sink"], time_col="t", lookback=8, fill_gaps=True
    )
    out = {(r["sink"], r["t"]): r for r in got.collect()}
    # dead series densified to the global horizon (t=29) with zeros
    assert out[("svc_dead", 25)]["cnt"] == 0
    assert out[("svc_dead", 20)]["is_drop"]  # first silent bucket flagged
    assert not any(
        r["is_drop"] for (s, _t), r in out.items() if s == "svc_live"
    )
    assert not any(r["is_spike"] for r in out.values())


def test_fill_gaps_flat_baseline_drop(spark):
    """Flat positive baseline, value falls to a third: ratio branch."""
    rows = [("s", t, 90) for t in range(10)] + [("s", 10, 20)]
    df = spark.createDataFrame(rows, "sink string, t int, cnt long")
    got = detect_rate_spikes(
        df, ["sink"], time_col="t", lookback=8, fill_gaps=True
    )
    flagged = {r["t"] for r in got.collect() if r["is_drop"]}
    assert flagged == {10}


def test_fill_gaps_preserves_real_buckets_and_counts(spark):
    rows = [("s", t, 50) for t in range(0, 20, 4)]  # sparse: every 4th
    df = spark.createDataFrame(rows, "sink string, t int, cnt long")
    from ves_spark.operators.anomaly import fill_bucket_gaps

    filled = fill_bucket_gaps(df, ["sink"], time_col="t", bucket_width=1)
    pdf = filled.orderBy("t").toPandas()
    assert list(pdf["t"]) == list(range(17))  # 0..16 densified
    assert pdf["cnt"].sum() == 50 * 5  # real values intact
    assert (pdf["cnt"] != 0).sum() == 5


def test_fill_gaps_timestamp_roundtrip(spark):
    rows = [("s", f"2025-01-01 00:{5*t:02d}:00", 100) for t in (0, 1, 2, 5)]
    df = spark.createDataFrame(rows, "sink string, ts string, cnt long").select(
        "sink", F.to_timestamp("ts").alias("ts"), "cnt"
    )
    from ves_spark.operators.anomaly import fill_bucket_gaps

    filled = fill_bucket_gaps(
        df, ["sink"], time_col="ts", bucket_width=300
    ).orderBy("ts")
    got = [(r["ts"].minute, r["cnt"]) for r in filled.collect()]
    assert got == [(0, 100), (5, 100), (10, 100), (15, 0), (20, 0), (25, 100)]


def test_timestamp_ntz_from_parquet_scan(spark, tmp_path):
    """Parquet scans yield TIMESTAMP_NTZ — a distinct type ANSI mode
    refuses to cast to BIGINT. Both the range key and the gap fill
    must handle it (regression: the isinstance(TimestampType) check
    missed NTZ and the operator threw on any real rollup table)."""
    p = str(tmp_path / "roll")
    rows = [("s", f"2025-01-01 00:{5*t:02d}:00", 100) for t in range(8)]
    rows.append(("s", "2025-01-01 00:45:00", 1200))  # gap at 00:40
    spark.createDataFrame(rows, "sink string, ts string, cnt long").select(
        "sink", F.to_timestamp("ts").cast("timestamp_ntz").alias("ts"), "cnt"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = detect_rate_spikes(
        df, ["sink"], time_col="ts", lookback=6, bucket_width=300,
        fill_gaps=True,
    )
    pdf = got.orderBy("ts").toPandas()
    assert dict(got.dtypes)["ts"] == "timestamp_ntz"
    assert len(pdf) == 10  # densified: 00:00..00:45
    assert bool(pdf[pdf.ts.dt.minute == 45].iloc[0]["is_spike"])
    assert bool(pdf[pdf.ts.dt.minute == 40].iloc[0]["is_drop"])


def test_ntz_fill_is_dst_proof(spark):
    """TIMESTAMP_NTZ is wall time: converting it through the session
    timezone would warp bucket spacing across a DST transition
    (fall-back 2025-11-02 in America/New_York repeats 01:00-02:00).
    The NTZ key must advance exactly 300 s per 5-min bucket and
    round-trip labels bit-for-bit regardless of session timezone."""
    from ves_spark.operators.anomaly import fill_bucket_gaps

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # NTZ wall times crossing the fall-back hour, one bucket missing
        times = ["01:45", "01:50", "01:55", "02:00", "02:10"]
        rows = [("s", f"2025-11-02 {t}:00", 100) for t in times]
        df = spark.createDataFrame(
            rows, "sink string, ts string, cnt long"
        ).select(
            "sink",
            F.to_timestamp("ts").cast("timestamp_ntz").alias("ts"),
            "cnt",
        )
        filled = fill_bucket_gaps(
            df, ["sink"], time_col="ts", bucket_width=300
        ).orderBy("ts")
        got = [(str(r["ts"]), r["cnt"]) for r in filled.collect()]
        assert got == [
            ("2025-11-02 01:45:00", 100),
            ("2025-11-02 01:50:00", 100),
            ("2025-11-02 01:55:00", 100),
            ("2025-11-02 02:00:00", 100),
            ("2025-11-02 02:05:00", 0),  # exactly ONE synthesized zero
            ("2025-11-02 02:10:00", 100),
        ]
        assert dict(filled.dtypes)["ts"] == "timestamp_ntz"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_fill_gaps_grid_bound_raises_loudly(spark):
    from ves_spark.operators.anomaly import fill_bucket_gaps

    df = spark.createDataFrame(
        [("s", 0, 1), ("s", 10_000, 1)], "sink string, t long, cnt long"
    )
    with pytest.raises(Exception, match="pre-filter"):
        fill_bucket_gaps(
            df, ["sink"], time_col="t", bucket_width=1,
            max_buckets_per_series=1000,
        ).count()
