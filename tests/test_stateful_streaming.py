"""Custom stateful streaming operator (applyInPandasWithState):
gap-based sessionization. Closed sessions must be emitted exactly
once, in-batch gaps close immediately, cross-batch sessions merge
through state, and the final open session closes via the event-time
timeout when the watermark passes — never before."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ves_spark.streaming.stateful import stream_sessionize

BASE = pd.Timestamp("2025-06-01 00:00:00")


def _events_file(path, rows):
    """rows: list of (user_id, minute)."""
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array(
                [BASE + pd.Timedelta(minutes=m) for _, m in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.usefixtures("spark")
def test_stream_sessionize_gap_semantics(spark, tmp_path):
    seq_dir = str(tmp_path / "ev")
    os.makedirs(seq_dir)
    schema = "user_id long, ts timestamp"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(seq_dir)
    )
    sessions = stream_sessionize(stream, gap_minutes=30, watermark="30 minutes")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    # batch 1: u1 one open session (0,10,20); u2 single event; u3 has an
    # IN-BATCH gap (0 then 100) -> its first session closes immediately
    _events_file(
        os.path.join(seq_dir, "f1.parquet"),
        [(1, 0), (1, 10), (1, 20), (2, 0), (3, 0), (3, 100)],
    )
    q.processAllAvailable()
    got1 = spark.table("t_sessions").toPandas()
    # u3's in-batch gap closes its first session directly; u3's event
    # at minute 100 also advances the watermark to 70, so u1's (end 20)
    # and u2's (end 0) open sessions time out in the same trigger cycle
    assert set(zip(got1["user_id"], got1["n_events"])) == {(3, 1), (1, 3), (2, 1)}

    # batch 2: u1 starts a second session (120,130) -> gap closes the
    # first; u2's 125 closes its first session the same way
    _events_file(
        os.path.join(seq_dir, "f2.parquet"), [(1, 120), (1, 130), (2, 125)]
    )
    q.processAllAvailable()

    # batch 3: a far-future row advances the watermark past every
    # last+gap -> the remaining open sessions close via TIMEOUT
    _events_file(os.path.join(seq_dir, "f3.parquet"), [(99, 1000)])
    q.processAllAvailable()
    q.stop()

    got = spark.table("t_sessions").toPandas()
    sess = {
        (int(r.user_id), r.session_start, r.session_end, int(r.n_events))
        for r in got.itertuples()
    }
    m = lambda x: BASE + pd.Timedelta(minutes=x)  # noqa: E731
    expected = {
        (1, m(0), m(20), 3),
        (1, m(120), m(130), 2),
        (2, m(0), m(0), 1),
        (2, m(125), m(125), 1),
        (3, m(0), m(0), 1),
        (3, m(100), m(100), 1),
    }
    assert sess == expected
    # u99's session is still open (nothing advanced the watermark past
    # it) — emitted zero times
    assert not (got["user_id"] == 99).any()
    # exactly-once: no duplicates
    assert len(got) == len(expected)
