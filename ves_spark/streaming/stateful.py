"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the escape hatch for stream semantics the
built-in windowed aggregates can't express (a session's extent depends
on the data, not a fixed grid).

Semantics (mirrors the batch ``sessionization`` query's 30-min-gap
definition, queries.py): per key, consecutive events with gaps <= GAP
belong to one session; a session CLOSES — and is emitted, exactly
once, in append mode — only when the event-time watermark passes
``last_event + gap`` (no event can still arrive that could extend or
bridge it; correctness under late data comes from the watermark, the
same contract as the windowed rollups). An in-batch gap therefore
does NOT emit immediately: the split session is kept PENDING in state
until the watermark confirms it, because a late event (above the
watermark, below the gap boundary) arriving in a later micro-batch
may legally bridge the two halves back into one session — append
mode could never retract an eagerly-emitted split.

State per key is the key's session set as three parallel arrays
(start, last, n) sorted by start: the final entry is the open
session, earlier entries are gap-split sessions awaiting watermark
confirmation. Each micro-batch folds its events in with a single
vectorized interval merge (sort + cummax + flatnonzero — no per-event
Python), emits every session whose ``last + gap`` the watermark has
passed, and arms an event-time timeout at the earliest unconfirmed
deadline so sessions flush even if the key never appears again.

Scale shape: state is hash-partitioned by key in the state store (one
shuffle on user_id — unavoidable for per-key order), the kernel is
Arrow-batched numpy, and state size is O(unconfirmed sessions) per
key — bounded by (batch span / gap), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
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

# state: the key's session set as parallel arrays sorted by start —
# epoch MICROseconds (the events' native precision: a millisecond
# truncation would shift a gap boundary for deltas within 1 ms of the
# gap and diverge from the batch oracle) so rows are plain longs (no
# tz pitfalls in the state store). Last entry = open session; earlier
# = pending confirmation.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("lasts", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)


def merge_sessions(
    starts: np.ndarray,
    lasts: np.ndarray,
    ns: np.ndarray,
    ev_ms: np.ndarray,
    gap_ms: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    # unit-agnostic: callers pass epoch times and the gap in ANY one
    # consistent integer unit (the streaming kernel uses microseconds)
    """Fold new event times into an existing session set (three
    parallel arrays) under the gap rule; returns the merged session
    set sorted by start. Fully vectorized: each event is a degenerate
    [t, t] interval; sort all intervals by start, take the running
    max of interval ends, and split where the next start exceeds the
    running end by more than the gap — the classic interval-merge,
    which also lets a late event bridge two previously-split sessions
    (numpy sort/cummax/reduceat; no per-event Python)."""
    s = np.concatenate([starts, ev_ms])
    e = np.concatenate([lasts, ev_ms])
    n = np.concatenate([ns, np.ones(len(ev_ms), dtype=np.int64)])
    order = np.argsort(s, kind="stable")
    s, e, n = s[order], e[order], n[order]
    cummax_e = np.maximum.accumulate(e)
    # break before i where s[i] - max(e[:i]) > gap
    breaks = np.flatnonzero(s[1:] - cummax_e[:-1] > gap_ms) + 1
    bounds = np.concatenate([[0], breaks])
    # group-end cummax is exact despite being global: the carry-in
    # from a previous group is < next group's start by > gap, hence
    # strictly below every end in that group
    out_s = s[bounds]
    out_e = cummax_e[np.concatenate([breaks - 1, [len(s) - 1]])]
    out_n = np.add.reduceat(n, bounds)
    return out_s, out_e, out_n


def _session_fn(gap_us: int):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        user_id = int(key[0])

        if state.exists:
            st, en, nn = (np.asarray(a, dtype=np.int64) for a in state.get)
        else:
            st = en = nn = np.empty(0, dtype=np.int64)

        if not state.hasTimedOut:
            ts = pd.concat([pdf["ts"] for pdf in pdfs], ignore_index=True)
            ev_us = (ts.astype("int64") // 1_000).to_numpy()  # ns -> us
            if len(ev_us):
                st, en, nn = merge_sessions(st, en, nn, ev_us, gap_us)

        # emit every session the watermark has confirmed closed; the
        # open (final) session included — if wm passed ITS deadline no
        # event can extend it either (only events with ts < wm are
        # dropped upstream by the watermark operator). STRICT compare:
        # an event at ts == wm is still admissible, and ts == en + gap
        # extends the session (merge_sessions splits only on > gap),
        # so at wm == en + gap the session may yet grow — emitting it
        # then would be premature and unretractable in append mode.
        # The watermark API is millisecond-grained: compare in us via
        # exact *1000.
        wm_us = state.getCurrentWatermarkMs() * 1_000
        confirmed = en + gap_us < wm_us
        if confirmed.any():
            cs, ce, cn = st[confirmed], en[confirmed], nn[confirmed]
            keep = ~confirmed
            st, en, nn = st[keep], en[keep], nn[keep]
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(cs), user_id, dtype=np.int64),
                    "session_start": pd.to_datetime(cs, unit="us"),
                    "session_end": pd.to_datetime(ce, unit="us"),
                    "n_events": cn,
                }
            )

        if len(st):
            state.update((st.tolist(), en.tolist(), nn.tolist()))
            # earliest unconfirmed deadline (lasts are increasing, so
            # it's the first entry). setTimeoutTimestamp is ms — use
            # floor+1 so firing implies wm_us >= (deadline//1000+1)
            # *1000 > deadline, satisfying the STRICT confirm above;
            # and if the watermark sits exactly AT a deadline (session
            # unconfirmed), the re-armed timeout is wm_ms+1 — strictly
            # above the watermark, as the GroupState API requires.
            state.setTimeoutTimestamp((int(en[0]) + gap_us) // 1_000 + 1)
        elif state.exists:
            state.remove()

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
        _session_fn(gap_minutes * 60_000_000),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
