"""Pure pandas/numpy reference implementation (test oracle only).

Plays the role the Rust reference would play if its normalization
stage existed: an independent, trivially-auditable computation of
parse → enrich → route → aggregate on the same fixture, used by
pytest to assert the Spark pipeline's outputs (SURVEY.md §5.2).
Never imported by pipeline code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ves_spark.enrich import DEFAULT_PRIORITY, UNKNOWN_ENV, UNKNOWN_TENANT
from ves_spark.parse import TIME_BUCKET_MINUTES
from ves_spark.schema import BASE_EPOCH, DEFAULT_SINK, LEVELS


def ref_parse(seq: pd.DataFrame) -> pd.DataFrame:
    df = seq.copy()
    head = np.stack([np.asarray(t[:3], dtype=np.int64) for t in df["tokens"]])
    df["level_id"] = (head[:, 0] % 8).astype(np.int32)
    df["ts_minute"] = head[:, 1].astype(np.int32)
    df["status_code"] = ((head[:, 2] % 5 + 1) * 100 + head[:, 2] % 100).astype(np.int32)
    df["level"] = [LEVELS[i] for i in df["level_id"]]
    df["ts"] = pd.to_datetime(BASE_EPOCH + df["ts_minute"].astype("int64") * 60, unit="s")
    bucket = (df["ts_minute"].astype("int64") // TIME_BUCKET_MINUTES) * TIME_BUCKET_MINUTES
    df["time_bucket"] = pd.to_datetime(BASE_EPOCH + bucket * 60, unit="s")
    df["status_class"] = (df["status_code"] // 100).astype(np.int32)
    return df


def ref_enrich(parsed: pd.DataFrame, source_meta: pd.DataFrame) -> pd.DataFrame:
    out = parsed.merge(source_meta, on="source", how="left")
    out["tenant"] = out["tenant"].fillna(UNKNOWN_TENANT)
    out["env"] = out["env"].fillna(UNKNOWN_ENV)
    out["priority"] = out["priority"].fillna(DEFAULT_PRIORITY).astype("int64")
    return out


def _rule_mask(df: pd.DataFrame, predicate: str) -> pd.Series:
    # Tiny interpreter for the fixture's predicate grammar.
    if predicate == "level IN ('ERROR','CRITICAL','FATAL')":
        return df["level"].isin(["ERROR", "CRITICAL", "FATAL"])
    if predicate == "priority >= 3":
        return df["priority"] >= 3
    if predicate == "status_class = 5":
        return df["status_class"] == 5
    if predicate == "env = 'prod' AND level = 'WARN'":
        return (df["env"] == "prod") & (df["level"] == "WARN")
    raise ValueError(f"refimpl does not know predicate: {predicate!r}")


def ref_route(enriched: pd.DataFrame, route_rules: pd.DataFrame) -> pd.DataFrame:
    rules = route_rules.sort_values("rule_id")
    pieces = []
    matched_any = pd.Series(False, index=enriched.index)
    seen: dict[str, pd.Series] = {}
    for _, r in rules.iterrows():
        m = _rule_mask(enriched, r["predicate"])
        matched_any |= m
        prev = seen.get(r["sink"], pd.Series(False, index=enriched.index))
        new = m & ~prev  # same row can't land in the same sink twice
        seen[r["sink"]] = prev | m
        if new.any():
            pieces.append(enriched[new].assign(sink=r["sink"]))
    if (~matched_any).any():
        pieces.append(enriched[~matched_any].assign(sink=DEFAULT_SINK))
    return pd.concat(pieces, ignore_index=True)


def ref_rollup(routed: pd.DataFrame) -> pd.DataFrame:
    def q(s: pd.Series, p: float) -> int:
        # nearest-rank (matches Spark percentile_approx at high accuracy):
        # value at 1-based rank ceil(p*n)
        v = np.sort(s.to_numpy())
        idx = min(max(int(np.ceil(p * len(v))) - 1, 0), len(v) - 1)
        return int(v[idx])

    g = routed.groupby(["sink", "source", "time_bucket"], as_index=False)
    return g.agg(
        cnt=("doc_id", "size"),
        sum_n_tok=("n_tok", "sum"),
        sum_bytes=("n_tok", lambda s: int(s.astype("int64").sum()) * 4),
        p50=("n_tok", lambda s: q(s, 0.5)),
        p95=("n_tok", lambda s: q(s, 0.95)),
        p99=("n_tok", lambda s: q(s, 0.99)),
    )
