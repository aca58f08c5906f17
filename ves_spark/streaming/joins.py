"""Stream-stream watermarked interval join — the telemetry
correlation primitive (match each error line to the request lines of
the same source that preceded it within a bounded interval) the
reference's multi-file tailing implies but never computes
(`src/tailer/manager.rs:21-29` tracks per-source streams side by
side; correlating them is left to the operator reading the logs).

Spark-first shape: this is Structured Streaming's native
stream-stream join — an equi-join on the key columns plus a
time-RANGE predicate between the two event-time columns, with
watermarks on BOTH sides. The range predicate is not an afterthought:
it is what lets Spark derive a state eviction bound (a buffered left
row can only ever match right rows in ``[ts - before, ts + after]``,
so once both watermarks pass that interval the row is dropped from
the join state). Without it, inner stream-stream joins buffer both
streams forever; outer joins are rejected outright.

State at 100 TB: per key, only rows inside the watermark+interval
horizon — O(rate × horizon), independent of stream history length.
The join shuffles both streams once on the key columns (the same
hash partitioning, so matching keys co-locate), exactly like the
batch equi-join.

Batch parity: ``withWatermark`` on a batch DataFrame is eliminated by
Catalyst (EliminateEventTimeWatermark), so the SAME function run on
batch frames is the oracle the streaming tests compare against.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    before: str = "10 minutes",
    after: str = "0 seconds",
    watermark: str = "10 minutes",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Join ``left`` to every ``right`` row with equal ``keys`` whose
    ``right_ts`` lies in ``[left_ts - before, left_ts + after]``.

    Every right column is renamed with ``right_suffix`` (keys
    included), so the output is collision-free: left columns keep
    their names, the matched right row rides along suffixed, and the
    suffixed key copies are dropped. ``how`` may be ``inner`` or
    ``left_outer`` — outer rows emit null-padded once the watermark
    proves no match can still arrive (append mode never retracts).
    """
    if not keys:
        raise ValueError("interval_join_streams needs at least one key column")
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"key column(s) {missing} absent from an input")
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")

    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, c + right_suffix)
    rts = right_ts + right_suffix

    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = r.withWatermark(rts, watermark)

    key_eq = [F.col(k) == F.col(k + right_suffix) for k in keys]
    # the state-bounding range predicate — keep it as two explicit
    # inequalities on the raw event-time columns so Spark's
    # StreamingSymmetricHashJoin recognizes the interval
    time_range = [
        F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {before}"),
        F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {after}"),
    ]
    cond = reduce(lambda a, b: a & b, key_eq + time_range)
    return l_wm.join(r_wm, cond, how).drop(
        *[k + right_suffix for k in keys]
    )


def correlate_error_context(
    errors: DataFrame,
    context: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """The concrete telemetry correlation over parsed/routed rows:
    each error row paired with every same-``source`` context row from
    the ``lookback`` interval ending at the error's ``ts``."""
    return interval_join_streams(
        errors,
        context,
        keys=["source"],
        left_ts="ts",
        right_ts="ts",
        before=lookback,
        after="0 seconds",
        watermark=watermark,
        how="inner",
        right_suffix="_ctx",
    )
