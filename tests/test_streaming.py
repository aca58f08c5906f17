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


def test_foreach_batch_per_sink_delivery(spark, stream_fixture, tmp_path):
    """Per-sink foreachBatch delivery through the catalog seam: the
    per-sink tables together equal the batch pipeline's routed rows,
    and redelivering a micro-batch (at-least-once foreachBatch) does
    not duplicate anything."""
    from ves_spark.sources.catalog import ParquetCatalog
    from ves_spark.streaming.stream_pipeline import (
        deliver_to_sinks,
        run_per_sink_delivery,
    )

    cat = ParquetCatalog(str(tmp_path / "tables"))
    run_per_sink_delivery(
        spark,
        stream_fixture["seq_dir"],
        stream_fixture["meta"],
        stream_fixture["rules"],
        cat,
        str(tmp_path / "ckpt"),
    )

    batch_seq = spark.read.parquet(stream_fixture["seq_dir"])
    meta = spark.read.parquet(stream_fixture["meta"])
    rules = spark.read.parquet(stream_fixture["rules"])
    routed = route(enrich(parse_builtin(batch_seq), meta), rules)
    exp_by_sink = {
        r["sink"]: r["cnt"]
        for r in routed.groupBy("sink").count().withColumnRenamed("count", "cnt").collect()
    }

    cols = ["doc_id", "source", "n_tok"]
    got_union = None
    for sink, exp_cnt in exp_by_sink.items():
        t = cat.read(spark, f"sink_{sink}")
        assert t.count() == exp_cnt, sink
        part = t.select(*cols).withColumn("sink", F.lit(sink))
        got_union = part if got_union is None else got_union.unionByName(part)
    assert_same_rows(
        got_union.toPandas(),
        routed.select(*cols, "sink").toPandas(),
    )

    # idempotent redelivery: replay one micro-batch with the same id
    deliver = deliver_to_sinks(cat)
    replay = routed.limit(0)  # empty frame, but same batch id as real one
    some_sink = next(iter(exp_by_sink))
    full = cat.read(spark, f"sink_{some_sink}")
    bid = full.select("_batch_id").distinct().collect()[0][0]
    deliver(routed.filter(F.col("sink") == some_sink), bid)
    assert cat.read(spark, f"sink_{some_sink}").count() == exp_by_sink[some_sink]
    _ = replay


def test_append_mode_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode semantics for real: a window is emitted once the
    watermark passes it, and a row arriving after that is DROPPED —
    not silently merged. Three files with forced mtime order become
    three micro-batches: W0 data, a watermark-advancing batch, then a
    late W0 row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ves_spark.streaming.stream_pipeline import (
        open_stream,
        stream_rollup,
        stream_transform,
    )
    from ves_spark.synth import write_fixture

    dims = str(tmp_path / "dims")
    write_fixture(dims, 10, seed=0)
    seq_dir = str(tmp_path / "seq")
    os.makedirs(seq_dir)

    def seq_file(name, rows, mtime):
        # rows: list of (doc_id, ts_minute); tokens[1] encodes event time
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.string()),
                "tokens": pa.array(
                    [[1, m, 3, 100, 200] for _, m in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([5] * len(rows), pa.int32()),
                "source": pa.array(["src-hot"] * len(rows), pa.string()),
            }
        )
        p = os.path.join(seq_dir, name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))
        return p

    import time as _t

    t0 = int(_t.time()) - 1000
    # W0 = window [00:00, 00:05): 4 rows — present before the query
    # starts; the other files are written BETWEEN processAllAvailable
    # calls so the micro-batch order is forced, not inferred from
    # file-listing order (which proved unreliable).
    seq_file("f1.parquet", [(f"a{i}", i) for i in range(4)], t0)

    stream = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(seq_dir, "f1.parquet")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(seq_dir)
    )
    routed = stream_transform(
        spark,
        stream,
        os.path.join(dims, "source_meta.parquet"),
        os.path.join(dims, "route_rules.parquet"),
    )
    agg = stream_rollup(routed, watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    # advance watermark: ts=00:40 -> wm = 00:30 > W0.end
    seq_file("f2.parquet", [("b0", 40)], t0 + 60)
    q.processAllAvailable()
    # late: inside W0 but after the watermark passed it
    seq_file("f3.parquet", [("late0", 2)], t0 + 120)
    q.processAllAvailable()
    q.stop()
    got = spark.table("t_append").toPandas()

    # only the closed W0 windows are emitted (f2's window is still
    # open; the late row was dropped, not merged and not re-emitted)
    assert len(got) > 0
    assert got["time_bucket"].nunique() == 1  # exactly window [0,5)
    # expected counts: f1's 4 rows through the same transform, batch-side
    batch_f1 = spark.read.parquet(os.path.join(seq_dir, "f1.parquet"))
    exp = (
        route(
            enrich(
                parse_builtin(batch_f1),
                spark.read.parquet(os.path.join(dims, "source_meta.parquet")),
            ),
            spark.read.parquet(os.path.join(dims, "route_rules.parquet")),
        )
        .groupBy("time_bucket", "sink", "source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
        )
        .toPandas()
    )
    assert_same_rows(got, exp)  # late row absent => counts match f1 alone
