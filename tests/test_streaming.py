"""Streaming wrapper: the same stateless stages over readStream must
produce the same rollup counts as the batch path."""

import os
import shutil

import pytest

from pyspark.sql import functions as F

from tests.conftest import assert_same_rows
from ves_spark.enrich import enrich
from ves_spark.parse import parse_builtin
from ves_spark.route import route
from ves_spark.streaming.stream_pipeline import run_to_memory
from ves_spark.synth import write_fixture


@pytest.fixture(scope="module")
def stream_fixture(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_fix")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    seq_dir = os.path.join(base, "seq")
    os.makedirs(seq_dir)
    for i in range(3):
        d = os.path.join(base, f"part{i}")
        write_fixture(d, 2000, seed=100 + i)
        shutil.move(
            os.path.join(d, "sequences.parquet"),
            os.path.join(seq_dir, f"part-{i}.parquet"),
        )
    meta_rules = os.path.join(base, "dims")
    write_fixture(meta_rules, 10, seed=0)
    return {
        "seq_dir": seq_dir,
        "meta": os.path.join(meta_rules, "source_meta.parquet"),
        "rules": os.path.join(meta_rules, "route_rules.parquet"),
    }


def test_stream_matches_batch_rollup(spark, stream_fixture):
    got = run_to_memory(
        spark,
        stream_fixture["seq_dir"],
        stream_fixture["meta"],
        stream_fixture["rules"],
        query_name="t_stream",
    ).toPandas()

    batch_seq = spark.read.parquet(stream_fixture["seq_dir"])
    meta = spark.read.parquet(stream_fixture["meta"])
    rules = spark.read.parquet(stream_fixture["rules"])
    routed = route(enrich(parse_builtin(batch_seq), meta), rules)
    exp = (
        routed.groupBy("time_bucket", "sink", "source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
        )
        .toPandas()
    )
    assert_same_rows(got, exp)


def test_hdr_bucket_roundtrip(spark):
    """Bucket index is monotone, contiguous, and lower-bound inverse is
    exact in the exact region / within 2^-p above it."""
    from ves_spark.streaming.hdr import hdr_bucket, hdr_bucket_lower

    df = spark.range(0, 5000).select(F.col("id").alias("v"))
    pdf = df.select(
        "v",
        hdr_bucket(F.col("v"), 7).alias("b"),
        hdr_bucket_lower(hdr_bucket(F.col("v"), 7), 7).alias("lo"),
    ).toPandas()
    assert (pdf.sort_values("v")["b"].diff().dropna() >= 0).all()  # monotone
    assert (pdf["lo"] <= pdf["v"]).all()
    exact = pdf[pdf["v"] < 256]
    assert (exact["lo"] == exact["v"]).all()
    above = pdf[pdf["v"] >= 256]
    assert ((above["v"] - above["lo"]) <= above["v"] * 2**-7 + 1).all()


def test_stream_percentiles_match_batch(spark, stream_fixture):
    """Streaming HDR-histogram percentiles equal the batch exact
    nearest-rank percentiles within one bucket width (n_tok <= 512 at
    p=7 -> abs diff <= 1)."""
    from ves_spark.streaming.stream_pipeline import (
        finalize_stream_percentiles,
        open_stream,
        stream_rollup_hdr,
        stream_transform,
    )

    stream = open_stream(spark, stream_fixture["seq_dir"])
    routed = stream_transform(
        spark, stream, stream_fixture["meta"], stream_fixture["rules"]
    )
    q = (
        stream_rollup_hdr(routed)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_hdr")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = finalize_stream_percentiles(spark.table("t_hdr")).toPandas()

    batch_seq = spark.read.parquet(stream_fixture["seq_dir"])
    meta = spark.read.parquet(stream_fixture["meta"])
    rules = spark.read.parquet(stream_fixture["rules"])
    b_routed = route(enrich(parse_builtin(batch_seq), meta), rules)
    exp = (
        b_routed.groupBy("time_bucket", "sink", "source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_v"),
            F.percentile_approx("n_tok", [0.5, 0.95, 0.99], 100_000).alias("_p"),
        )
        .toPandas()
    )
    m = got.merge(exp, on=["time_bucket", "sink", "source"], suffixes=("", "_e"))
    assert len(m) == len(got) == len(exp)
    assert (m["cnt"] == m["cnt_e"]).all()  # counts exact
    assert (m["sum_v"] == m["sum_v_e"]).all()  # sums exact
    for i, name in enumerate(["p50", "p95", "p99"]):
        exact_v = m["_p"].map(lambda a, i=i: a[i])
        assert (m[name] - exact_v).abs().le(1).all(), name
