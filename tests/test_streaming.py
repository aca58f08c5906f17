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
