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
                         ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
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
