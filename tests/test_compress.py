"""Deflate-ratio quality filter (operators/compress.py): byte counts
must replay exactly against direct zlib, the ratio must separate
planted repetitive text from high-entropy text, and results must be
invariant to Arrow batch boundaries / partitioning."""

from __future__ import annotations

import random
import string
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ves_spark.operators.compress import deflate_features, repetitive_docs

rng = random.Random(31)
REPETITIVE = "the same boilerplate line over and over\n" * 40
PROSE = " ".join(
    "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(2, 9)))
    for _ in range(300)
)


def _docs(spark):
    rows = [
        ("d_rep", REPETITIVE),
        ("d_prose", PROSE),
        ("d_empty", ""),
        ("d_null", None),
        ("d_uni", "héllo wörld ünïcode ✓" * 20),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_byte_counts_replay_direct_zlib(spark):
    got = {
        r["doc_id"]: (r["raw_bytes"], r["comp_bytes"], r["deflate_ratio"])
        for r in deflate_features(_docs(spark), "text").collect()
    }
    for doc_id, text in [
        ("d_rep", REPETITIVE),
        ("d_prose", PROSE),
        ("d_uni", "héllo wörld ünïcode ✓" * 20),
    ]:
        b = text.encode("utf-8")
        exp = (len(b), len(zlib.compress(b, 6)))
        assert got[doc_id][:2] == exp
        assert got[doc_id][2] == pytest.approx(exp[1] / exp[0])
    # empty/null payloads: zero raw bytes, null ratio (not "very
    # repetitive" — no evidence either way)
    for doc_id in ("d_empty", "d_null"):
        assert got[doc_id][0] == 0
        assert got[doc_id][2] is None


def test_ratio_separates_repetitive_from_prose(spark):
    got = {
        r["doc_id"]: r["deflate_ratio"]
        for r in deflate_features(_docs(spark), "text").collect()
    }
    assert got["d_rep"] < 0.2 < got["d_prose"]
    kept = {r["doc_id"] for r in repetitive_docs(_docs(spark), "text").collect()}
    # d_uni is one phrase repeated 20x — genuinely repetitive, kept too
    assert kept == {"d_rep", "d_uni"}


def test_tokens_mode_replays_int32_wire_bytes(spark):
    rows = [
        ("t_rep", [7] * 500),
        ("t_rand", [rng.randrange(50_000) for _ in range(500)]),
        ("t_empty", []),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r["doc_id"]: (r["raw_bytes"], r["comp_bytes"])
        for r in deflate_features(df, "tokens", mode="tokens").collect()
    }
    for doc_id, toks in rows:
        b = np.asarray(toks, dtype="<i4").tobytes()
        assert got[doc_id] == (len(b), len(zlib.compress(b, 6)))
    assert got["t_rep"][1] < got["t_rand"][1]  # constant stream compresses more


def test_partitioning_invariant(spark):
    base = _docs(spark)
    a = {
        r["doc_id"]: r["comp_bytes"]
        for r in deflate_features(base, "text").collect()
    }
    b = {
        r["doc_id"]: r["comp_bytes"]
        for r in deflate_features(base.repartition(7), "text").collect()
    }
    assert a == b


def test_bad_args_raise(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="mode"):
        deflate_features(df, "text", mode="gzip")
    with pytest.raises(ValueError, match="level"):
        deflate_features(df, "text", level=0)
