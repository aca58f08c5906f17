"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the escape hatch for stream semantics the
built-in windowed aggregates can't express (a session's extent depends
on the data, not a fixed grid).

Semantics (mirrors the batch ``sessionization`` query's 30-min-gap
definition, queries.py): per key, consecutive events with gaps <= GAP
belong to one session; a session CLOSES when the event-time watermark
passes ``last_event + gap`` (no earlier event can arrive that could
extend it — correctness under late data comes from the watermark, the
same contract as the windowed rollups). Closed sessions are emitted
exactly once in append mode.

State per key is three scalars (session start, last event ts, event
count); each micro-batch merges its rows into the open session,
emits any sessions the batch itself closed (an in-batch gap), and arms
an event-time timeout at ``last + gap`` so the final session closes
when the watermark passes it even if the key never appears again.

Scale shape: state is hash-partitioned by key in the state store
(one shuffle on user_id — unavoidable for per-key order), the kernel
is Arrow-batched pandas (vectorized sort + diff per group), and state
size is O(open sessions), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (session_start_ms, last_event_ms, n_events) — epoch millis so
# the state row is three plain longs (no tz pitfalls in the state store)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_ms: int):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        user_id = int(key[0])
        closed: list[tuple[int, int, int]] = []  # (start_ms, end_ms, n)

        if state.hasTimedOut:
            # watermark passed last+gap with no new events: the open
            # session can no longer be extended — emit and clear
            start_ms, last_ms, n = state.get
            closed.append((start_ms, last_ms, n))
            state.remove()
        else:
            ts = pd.concat([pdf["ts"] for pdf in pdfs], ignore_index=True)
            ev_ms = (
                ts.sort_values(ignore_index=True).astype("int64") // 1_000_000
            ).to_numpy()
            if len(ev_ms):
                start_ms = last_ms = n = 0
                if state.exists:
                    start_ms, last_ms, n = state.get
                # sequential state transition per event of this key's
                # batch slice — inherently ordered, bounded per batch
                for t_ms in ev_ms:
                    t_ms = int(t_ms)
                    if n and t_ms - last_ms > gap_ms:
                        closed.append((start_ms, last_ms, n))
                        n = 0
                    if not n:
                        start_ms, last_ms, n = t_ms, t_ms, 1
                    else:
                        # max: an out-of-order event inside the open
                        # session must not move its end backwards
                        last_ms, n = max(last_ms, t_ms), n + 1
                state.update((start_ms, last_ms, n))
                # close via timeout once the watermark passes last+gap
                state.setTimeoutTimestamp(last_ms + gap_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="ms") for s, _, _ in closed
                    ],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap sessionization: emits one row per CLOSED session
    (append mode). ``events`` needs (key_col, ts_col)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = events.select(key_col, ts_col).withWatermark(ts_col, watermark)
    return keyed.groupBy(key_col).applyInPandasWithState(
        _session_fn(gap_minutes * 60_000),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
