"""First-fit-decreasing no-split packing (packing.py::pack_first_fit_decreasing):
bit-exact vs a scalar FFD reference, capacity/exactly-once
invariants, the 11/9 OPT bound, partitioning invariance, and the
oversize-doc refusal."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ves_spark.operators.packing import pack_first_fit_decreasing, packing_stats

CAP = 100


def _ffd_ref(docs: list[tuple[str, int]], cap: int) -> dict[str, int]:
    """(doc_id, size) -> doc_id -> bin_id, textbook FFD."""
    order = sorted(docs, key=lambda d: (-d[1], d[0]))
    residual: list[int] = []
    out = {}
    for doc_id, size in order:
        for b, r in enumerate(residual):
            if r >= size:
                residual[b] -= size
                out[doc_id] = b
                break
        else:
            residual.append(cap - size)
            out[doc_id] = len(residual) - 1
    return out


def _docs(seed=5, n=300, streams=("s1", "s2")):
    rng = random.Random(seed)
    return [
        (rng.choice(streams), f"d{i:04d}", rng.randint(1, CAP))
        for i in range(n)
    ]


def test_matches_scalar_ffd_reference(spark):
    rows = _docs()
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    got = {
        (r["source"], r["doc_id"]): r["bin_id"]
        for r in pack_first_fit_decreasing(df, CAP).collect()
    }
    for stream in ("s1", "s2"):
        ref = _ffd_ref([(d, s) for src, d, s in rows if src == stream], CAP)
        for doc_id, b in ref.items():
            assert got[(stream, doc_id)] == b


def test_invariants_and_opt_bound(spark):
    rows = _docs(seed=11, n=500, streams=("a",))
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    packed = pack_first_fit_decreasing(df, CAP).collect()
    # exactly-once
    assert sorted(r["doc_id"] for r in packed) == sorted(r[1] for r in rows)
    # no bin over capacity
    fills: dict[int, int] = {}
    for r in packed:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tok"]
    assert max(fills.values()) <= CAP
    # dense 0-based ids and the FFD guarantee vs the volume lower bound
    n_bins = max(fills) + 1
    assert set(fills) == set(range(n_bins))
    opt_lb = math.ceil(sum(s for _, _, s in rows) / CAP)
    assert n_bins <= (11 * opt_lb) // 9 + 1

    stats = packing_stats(
        pack_first_fit_decreasing(df, CAP), CAP
    ).collect()[0]
    assert stats["n_bins"] == n_bins
    assert stats["fill"] == pytest.approx(
        sum(s for _, _, s in rows) / (n_bins * CAP)
    )


def test_partitioning_invariant_and_numeric_stream_cols(spark):
    rows = [(i % 7, f"d{i:03d}", 10 + i % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "shard long, doc_id string, n_tok int")
    a = sorted(
        map(tuple, pack_first_fit_decreasing(df, CAP, stream_cols=["shard"]).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_first_fit_decreasing(
                df.repartition(13), CAP, stream_cols=["shard"]
            ).collect(),
        )
    )
    assert a == b
    assert isinstance(a[0][0], int)  # shard kept its numeric type


def test_oversize_doc_raises(spark):
    df = spark.createDataFrame(
        [("s", "ok", 50), ("s", "too_big", CAP + 1)],
        "source string, doc_id string, n_tok int",
    )
    with pytest.raises(Exception, match="too_big"):
        pack_first_fit_decreasing(df, CAP).collect()
    with pytest.raises(ValueError, match="capacity"):
        pack_first_fit_decreasing(df, 0)
