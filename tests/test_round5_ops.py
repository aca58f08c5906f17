"""Round-5 operator tests: PII redaction, SemDeDup semantic dedup,
bloom-filter incremental dedup (with a DuckDB anti-join oracle)."""

import os

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# =====================================================================
# PII redaction
# =====================================================================


def test_pii_features_planted(spark):
    from ves_spark.operators.text import pii_features

    rows = [
        (1, "reach me at alice.smith+x@mail-host.org or bob@x.io today"),
        (2, "server 10.0.42.7 and 192.168.1.200 are down"),
        (3, "call +123-456-7890 or 555 867 5309 now"),
        (4, "no pii here at all"),
        (5, "mixed: a@b.co from 8.8.8.8 dial 111-222-3333"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_features(df, "text").collect()}

    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (2, 0, 0)
    assert "<EMAIL>" in out[1]["redacted"] and "@" not in out[1]["redacted"]
    assert (out[2]["n_emails"], out[2]["n_ipv4"]) == (0, 2)
    assert out[2]["redacted"] == "server <IP> and <IP> are down"
    assert out[3]["n_phones"] == 2
    assert out[3]["redacted"] == "call <PHONE> or <PHONE> now"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[4]["redacted"] == out[4]["text"]
    assert (out[5]["n_emails"], out[5]["n_ipv4"], out[5]["n_phones"]) == (1, 1, 1)


def test_pii_counts_are_pipeline_consistent(spark):
    """An email's or IP's digits must never double-count as a phone:
    each detector runs on the PREVIOUS stage's redacted text."""
    from ves_spark.operators.text import pii_features

    df = spark.createDataFrame(
        [(1, "ip 100.200.300.400 looks phone-ish 100-200-3004")],
        "doc_id long, text string",
    )
    r = pii_features(df, "text").collect()[0]
    # the IP is consumed by the IP stage; only the true phone remains
    assert r["n_ipv4"] == 1
    assert r["n_phones"] == 1
    assert r["redacted"] == "ip <IP> looks phone-ish <PHONE>"


# =====================================================================
# SemDeDup semantic dedup
# =====================================================================


def test_semantic_dedup_drops_planted_copies(spark):
    from ves_spark.operators.similarity import semantic_dedup

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    base = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    # planted near-dups: copy with the last component zeroed, id + 1e6
    mutated = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("c_id"),
        F.concat(
            F.slice(F.col("embedding"), 1, 63),
            F.array(F.lit(0.0).cast("float")),
        ).alias("c_vec"),
    )
    corpus = base.unionAll(mutated)
    n_base = base.count()
    n_mut = mutated.count()

    kept = semantic_dedup(corpus, threshold=0.9, n_cents=16, train_iters=1)
    kept_ids = {r["c_id"] for r in kept.collect()}

    # the synth embeddings have no natural near-dups (max pairwise
    # cosine ~0.51), so every base vector survives ...
    assert all(i in kept_ids for i in range(n_base))
    # ... and nearly every planted copy is dropped (a copy escapes
    # only if it straddles a cluster boundary from its original)
    dropped = n_base + n_mut - len(kept_ids)
    assert dropped >= 0.9 * n_mut
    # survivors all carry a cluster assignment column
    assert kept.columns == ["c_id", "cent_id"]


def test_semantic_dedup_deterministic(spark):
    from ves_spark.operators.similarity import semantic_dedup

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).limit(100)
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    a = sorted(map(tuple, semantic_dedup(corpus, n_cents=8, train_iters=1).collect()))
    b = sorted(map(tuple, semantic_dedup(corpus, n_cents=8, train_iters=1).collect()))
    assert a == b and len(a) > 0


# =====================================================================
# Bloom-filter incremental dedup
# =====================================================================


def test_bloom_bitmap_no_false_negatives(spark):
    from ves_spark.operators.bloom import _might_contain_udf, build_bloom_bitmap

    df = spark.range(0, 5000).select(F.xxhash64(F.col("id").cast("string")).alias("h"))
    m_bits, k = 1 << 17, 7
    bloom = build_bloom_bitmap(df, m_bits, k)
    probe = _might_contain_udf(bloom, m_bits, k)
    miss = df.filter(~probe(F.col("h"))).count()
    assert miss == 0  # inserted keys always probe positive


def test_bloom_fp_rate_bounded(spark):
    from ves_spark.operators.bloom import _might_contain_udf, build_bloom_bitmap

    ins = spark.range(0, 5000).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    m_bits, k = 1 << 17, 7  # ~26 bits/key -> fp well under 1e-3
    bloom = build_bloom_bitmap(ins, m_bits, k)
    probe = _might_contain_udf(bloom, m_bits, k)
    other = spark.range(1_000_000, 1_020_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    fp = other.filter(probe(F.col("h"))).count()
    assert fp / 20_000 < 0.01


def test_dedup_against_history_matches_antijoin_oracle(spark):
    from ves_spark.operators.bloom import dedup_against_history

    docs = os.path.join(SF_DIR, "documents.parquet")
    d = spark.read.parquet(docs)
    hist = d.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    new = d.select("doc_id", "text")  # every 3rd is a redelivery

    kept = dedup_against_history(new, hist).select("doc_id").toPandas()
    expect = duckdb.sql(
        f"""
        SELECT doc_id FROM '{docs}'
        WHERE text NOT IN (SELECT text FROM '{docs}' WHERE doc_id % 3 = 0)
        """
    ).df()
    assert sorted(kept["doc_id"]) == sorted(expect["doc_id"])
    assert len(kept) > 0 and len(kept) < new.count()


def test_dedup_against_empty_history_keeps_all(spark):
    from ves_spark.operators.bloom import dedup_against_history

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    hist = d.filter(F.lit(False))
    assert dedup_against_history(d, hist).count() == d.count()


# =====================================================================
# Temperature-weighted source mixing (mix_sqrt leg of sample_documents)
# =====================================================================


def test_mix_sqrt_matches_independent_hash_replay(spark):
    """The mix_sqrt keep set must equal an independent hashlib-md5
    replay of the rule: keep doc iff md5_32(doc_id) % 1e6 <
    floor(1e6 * sqrt(n_min / n_source)) — per-source rates derived
    from exact counts, smallest source kept whole."""
    import hashlib
    import math

    import pandas as pd

    from ves_spark.queries import queries

    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    counts = docs.groupby("source").size()
    n_min = counts.min()
    thr = {
        s: math.floor(1_000_000 * math.sqrt(n_min / n))
        for s, n in counts.items()
    }

    def h32(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)

    expected = {
        int(r.doc_id)
        for r in docs.itertuples()
        if h32(r.doc_id) % 1_000_000 < thr[r.source]
    }
    got = {
        r["doc_id"]
        for r in queries()["sample_documents"](spark, SF_DIR)
        .filter(F.col("strategy") == "mix_sqrt")
        .collect()
    }
    assert got == expected
    # the smallest source is kept in full (thr == 1e6)
    smallest = counts.idxmin()
    kept_small = docs[docs.source == smallest].doc_id.astype(int)
    assert set(kept_small).issubset(expected | set())


# =====================================================================
# Deterministic global shuffle (training order)
# =====================================================================


def test_deterministic_shuffle_replayable_and_partition_invariant(spark):
    from ves_spark.operators.packing import deterministic_shuffle

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))

    def order_of(inp, seed):
        out = deterministic_shuffle(inp, seed=seed, num_partitions=7)
        return [r["doc_id"] for r in out.toLocalIterator()]

    a = order_of(df, seed=1)
    # replay: same seed -> identical permutation
    assert order_of(df, seed=1) == a
    # input partitioning must not matter
    assert order_of(df.repartition(13), seed=1) == a
    # it IS a permutation
    assert sorted(a) == list(range(2000))
    # a different seed gives a different (still complete) permutation
    b = order_of(df, seed=2)
    assert b != a and sorted(b) == list(range(2000))


def test_deterministic_shuffle_plans_range_exchange(spark):
    from ves_spark.operators.packing import deterministic_shuffle

    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    plan = (
        deterministic_shuffle(df, seed=3, num_partitions=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


# =====================================================================
# Character-bigram LM fluency filter
# =====================================================================


def test_lm_fluency_matches_scalar_reference(spark):
    """Tiny corpus where the smoothed bigram model is computable by
    hand (scalar replay with the same quantization)."""
    import math
    from collections import Counter

    rows = [(1, "ababab"), (2, "abq"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from ves_spark.operators.text import lm_fluency

    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in lm_fluency(df, "text", "doc_id").collect()
    }

    grams = Counter()
    for _, t in rows:
        for i in range(len(t) - 1):
            grams[t[i : i + 2]] += 1
    pre = Counter()
    for g, c in grams.items():
        pre[g[0]] += c
    q = {
        g: math.floor((c + 1.0) / (pre[g[0]] + 96.0) * (1 << 30))
        for g, c in grams.items()
    }

    def score(t):
        qs = [q[t[i : i + 2]] for i in range(len(t) - 1)]
        return round(sum(qs) / (len(qs) * float(1 << 30)), 6)

    assert got[1] == (5, score("ababab"))
    assert got[2] == (2, score("abq"))
    assert 3 not in got  # below two chars -> no bigrams, no row
    # the repetitive doc's transitions are all high-count -> higher
    # fluency than the doc ending in the rare 'bq' transition
    assert got[1][1] > got[2][1]


def test_lm_fluency_plan_broadcasts_model_no_python(spark):
    from ves_spark.queries import queries

    df = queries()["lm_fluency_docs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# =====================================================================
# Bucketized range (interval) join
# =====================================================================


def _naive_range_join(points, intervals):
    """Reference: theta-join by nested loops in Python."""
    out = []
    for pid, p in points:
        for iid, s, e in intervals:
            if s <= p < e:
                out.append((pid, iid))
    return sorted(out)


@pytest.mark.parametrize("bucket_width", [1.0, 2.0, 7.5])
def test_bucketed_range_join_matches_naive(spark, bucket_width):
    """Boundary geometry: point == start included, point == end
    excluded, intervals spanning several buckets, empty and negative
    intervals, points/intervals in negative coordinates."""
    from ves_spark.operators.joins import bucketed_range_join

    points = [(1, 0.0), (2, 5.0), (3, 5.5), (4, 10.0), (5, -3.0), (6, 19.99)]
    intervals = [
        (10, 0.0, 5.0),    # point 2 at e -> excluded; point 1 at s -> in
        (11, 5.0, 5.5),    # sub-bucket sliver
        (12, -4.0, 21.0),  # spans many buckets, negative start
        (13, 7.0, 7.0),    # empty (e == s) -> no matches
        (14, 9.0, 3.0),    # inverted (e < s) -> no matches
        (15, 19.5, 20.5),  # catches 19.99
    ]
    p_df = spark.createDataFrame(points, "pid long, p double")
    i_df = spark.createDataFrame(intervals, "iid long, s double, e double")

    got = sorted(
        (r["pid"], r["iid"])
        for r in bucketed_range_join(
            p_df, i_df, "p", "s", "e", bucket_width
        ).collect()
    )
    assert got == _naive_range_join(points, intervals)


def test_bucketed_range_join_no_duplicate_pairs(spark):
    """An interval replicated into k buckets must still yield each
    matching (point, interval) pair exactly once."""
    from ves_spark.operators.joins import bucketed_range_join

    p_df = spark.createDataFrame([(1, 50.0)], "pid long, p double")
    i_df = spark.createDataFrame([(9, 0.0, 100.0)], "iid long, s double, e double")
    rows = bucketed_range_join(p_df, i_df, "p", "s", "e", 10.0).collect()
    assert len(rows) == 1


def test_range_join_plan_has_no_nested_loop(spark):
    """The whole point of the operator: an equi-join on the bucket id,
    never BroadcastNestedLoopJoin / CartesianProduct."""
    from ves_spark.queries import queries

    df = queries()["range_join_ship_orders"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


# =====================================================================
# Multi-resolution rollup cascade
# =====================================================================


def test_rollup_cascade_each_level_equals_direct(spark):
    """Hand frame crossing 5m/1h/1d boundaries: every cascade level
    must equal aggregating raw directly at that resolution (the
    mergeability invariant), including the cent quantization."""
    import math
    from collections import defaultdict
    from datetime import datetime, timezone

    rows = [
        # (ts_epoch_sec, key, value)
        (100, "a", 1.005),       # floor(100.5) = 100 cents
        (290, "a", 2.0),         # same 5m bucket as above
        (301, "a", 3.33),        # next 5m bucket, same hour
        (3601, "a", 4.0),        # next hour, same day
        (86401, "a", 5.55),      # next day
        (100, "b", 10.0),
    ]
    df = spark.createDataFrame(
        [
            (datetime.fromtimestamp(u, tz=timezone.utc).replace(tzinfo=None), k, v)
            for u, k, v in rows
        ],
        "ts timestamp, event_type string, value double",
    )
    from ves_spark.aggregate import rollup_cascade

    got = {
        (r["res"], r["event_type"], r["bucket_start"]): (
            r["cnt"],
            r["sum_value"],
            r["avg_value"],
        )
        for r in rollup_cascade(df).collect()
    }

    for res, label in [(300, "5m"), (3600, "1h"), (86400, "1d")]:
        direct = defaultdict(lambda: [0, 0])
        for u, k, v in rows:
            b = math.floor(u / float(res)) * res
            direct[(k, b)][0] += 1
            direct[(k, b)][1] += math.floor(v * 100.0)
        for (k, b), (cnt, cents) in direct.items():
            want = (cnt, round(cents / 100.0, 2), round(cents / (100.0 * cnt), 4))
            assert got[(label, k, b)] == want, (label, k, b)
    # every level present, no extra rows
    n_5m = len({(k, math.floor(u / 300) * 300) for u, k, _ in rows})
    n_1h = len({(k, math.floor(u / 3600) * 3600) for u, k, _ in rows})
    n_1d = len({(k, math.floor(u / 86400) * 86400) for u, k, _ in rows})
    assert len(got) == n_5m + n_1h + n_1d


def test_rollup_cascade_rejects_non_nesting(spark):
    from ves_spark.aggregate import rollup_cascade

    df = spark.createDataFrame([], "ts timestamp, event_type string, value double")
    with pytest.raises(ValueError, match="nest"):
        rollup_cascade(df, resolutions=(300, 1000), labels=("a", "b"))


def test_rollup_cascade_coarse_levels_read_cached_partials(spark):
    """The cascade must not rescan raw per resolution: the persisted
    checkpointed partials appear as an RDD scan and NO file scan
    remains in the returned plan (raw was read once, during the eager
    checkpoint)."""
    from ves_spark.queries import queries

    df = queries()["time_bucket_rollup"](spark, SF_DIR)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert "FileScan" not in plan


# =====================================================================
# Mergeable HDR percentile partials in finalize_rollup
# =====================================================================


def _mini_pipeline(spark, tmp_path, run_id="run-hdr", crash_after=None):
    import os

    from ves_spark.pipeline import Pipeline, PipelineConfig
    from ves_spark.synth import write_fixture

    fix = os.path.join(str(tmp_path), "fix")
    if not os.path.exists(fix):
        write_fixture(fix, 10_000, seed=5)
    p = Pipeline(
        spark,
        PipelineConfig(
            sequences_path=os.path.join(fix, "sequences.parquet"),
            source_meta_path=os.path.join(fix, "source_meta.parquet"),
            route_rules_path=os.path.join(fix, "route_rules.parquet"),
            out_dir=os.path.join(str(tmp_path), "out"),
            n_units=4,
            units_per_increment=2,
            run_id=run_id,
        ),
    )
    return p


def test_finalize_hdr_equals_direct_histogram(spark, tmp_path):
    """The merged hdr_partial percentiles must equal the HDR
    percentiles computed directly over the full routed table — the
    mergeability invariant that lets finalize skip the corpus scan."""
    from ves_spark.streaming.hdr import (
        percentiles_from_histogram,
        rollup_histogram,
    )

    p = _mini_pipeline(spark, tmp_path)
    p.run()
    got = (
        p.finalize_rollup()  # default: hdr partials
        .select("sink", "source", "time_bucket", "p50", "p95", "p99")
        .toPandas()
        .sort_values(["sink", "source", "time_bucket"])
        .reset_index(drop=True)
    )
    direct = (
        percentiles_from_histogram(
            rollup_histogram(
                p.routed(), ["sink", "source", "time_bucket"], "n_tok"
            ),
            ["sink", "source", "time_bucket"],
        )
        .select("sink", "source", "time_bucket", "p50", "p95", "p99")
        .toPandas()
        .sort_values(["sink", "source", "time_bucket"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, direct)
    # exact columns unaffected by the percentile source
    a = p.finalize_rollup(percentiles="hdr")
    b = p.finalize_rollup(percentiles="scan")
    cols = ["sink", "source", "time_bucket", "cnt", "sum_n_tok", "sum_bytes"]
    pd.testing.assert_frame_equal(
        a.select(cols).toPandas().sort_values(cols).reset_index(drop=True),
        b.select(cols).toPandas().sort_values(cols).reset_index(drop=True),
    )


def test_finalize_hdr_survives_crash_resume(spark, tmp_path):
    """Percentile partials follow the same crash-cleanup lifecycle as
    the exact partials: resumed == single-shot including percentiles."""
    import pandas as pd
    import pytest as _pt

    single = _mini_pipeline(spark, tmp_path / "a", run_id="run-s")
    single.run()
    crashy = _mini_pipeline(spark, tmp_path / "b", run_id="run-c")
    with _pt.raises(RuntimeError):
        crashy.run(fail_after_units=2)
    resumed = _mini_pipeline(spark, tmp_path / "b", run_id="run-r")
    resumed.run()
    cols = ["sink", "source", "time_bucket", "cnt", "p50", "p95", "p99"]
    pd.testing.assert_frame_equal(
        resumed.finalize_rollup().select(cols).toPandas()
        .sort_values(cols[:3]).reset_index(drop=True),
        single.finalize_rollup().select(cols).toPandas()
        .sort_values(cols[:3]).reset_index(drop=True),
    )


def test_rollup_cascade_rejects_label_length_mismatch(spark):
    from ves_spark.aggregate import rollup_cascade

    df = spark.createDataFrame([], "ts timestamp, event_type string, value double")
    with pytest.raises(ValueError, match="length mismatch"):
        rollup_cascade(df, resolutions=(60, 300, 3600, 86400))


def test_finalize_rollup_rejects_unknown_percentile_mode(spark, tmp_path):
    p = _mini_pipeline(spark, tmp_path)
    with pytest.raises(ValueError, match="percentiles"):
        p.finalize_rollup(percentiles="HDR")


def test_range_join_outlier_interval_fails_loudly(spark):
    """A single interval spanning more buckets than the replication
    cap must fail with the diagnostic, not explode the shuffle."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from ves_spark.operators.joins import bucketed_range_join

    p_df = spark.createDataFrame([(1, 5.0)], "pid long, p double")
    i_df = spark.createDataFrame(
        [(9, 0.0, 1e9)], "iid long, s double, e double"
    )
    with pytest.raises(Exception, match="bucketed_range_join"):
        bucketed_range_join(p_df, i_df, "p", "s", "e", 1.0).collect()
    # same span with an adequate width is fine
    assert (
        bucketed_range_join(p_df, i_df, "p", "s", "e", 1e6).count() == 1
    )


def test_dedup_against_history_expected_keys_skips_count_scan(spark, monkeypatch):
    """With expected_keys supplied (last epoch's checkpointed corpus
    count), NO count() scan of history runs — proven by making
    DataFrame.count explode — and the result is still the exact
    anti-join."""
    from pyspark.sql import DataFrame as _DF

    from ves_spark.operators.bloom import dedup_against_history

    hist = spark.createDataFrame(
        [(f"h{i}", f"text {i % 40}") for i in range(200)], "doc_id string, text string"
    )
    new = spark.createDataFrame(
        [("n1", "text 3"), ("n2", "brand new"), ("n3", "text 17"), ("n4", "also new")],
        "doc_id string, text string",
    )

    def _boom(self):
        raise AssertionError("count() scan ran despite expected_keys")

    monkeypatch.setattr(_DF, "count", _boom)
    kept = dedup_against_history(new, hist, expected_keys=200).toPandas()
    assert sorted(kept["doc_id"]) == ["n2", "n4"]


def _skewed_fix(spark):
    # 90% of big rows on one hot key; small has m:n duplicate keys
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i % 7}", i * 3) for i in range(2000)],
        "row_id long, key string, val long",
    )
    small = spark.createDataFrame(
        [("hot", "H1"), ("hot", "H2"), ("k0", "A"), ("k3", "B"), ("nokey", "Z")],
        "key string, attr string",
    )
    return big, small


def test_salted_skew_join_inner_equals_plain(spark):
    from ves_spark.operators.joins import salted_skew_join

    big, small = _skewed_fix(spark)
    got = (
        salted_skew_join(big, small, "key", n_salts=8)
        .orderBy("row_id", "attr")
        .toPandas()
    )
    want = big.join(small, "key").orderBy("row_id", "attr").toPandas()
    assert got[want.columns.tolist()].equals(want)


def test_salted_skew_join_left_preserves_unmatched_once(spark):
    from ves_spark.operators.joins import salted_skew_join

    big, small = _skewed_fix(spark)
    got = (
        salted_skew_join(big, small, "key", n_salts=8, how="left")
        .orderBy("row_id", "attr")
        .toPandas()
    )
    want = big.join(small, "key", "left").orderBy("row_id", "attr").toPandas()
    assert got[want.columns.tolist()].equals(want)
    # unmatched keys (k1,k2,k4..) present exactly once per big row
    assert len(got) == len(want)


def test_salted_skew_join_spreads_hot_key(spark):
    """The point of the salt: the hot key's rows must land on >1
    (key, salt) reducer group, and the join must not be a broadcast."""
    from ves_spark.operators.joins import salted_skew_join

    big, small = _skewed_fix(spark)
    b = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(8)
        ).cast("int"),
    )
    n_groups = (
        b.filter(F.col("key") == "hot").select("_salt").distinct().count()
    )
    assert n_groups >= 6  # 1800 hot rows spread over 8 salts

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_skew_join(big, small, "key", n_salts=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan
    assert "_salt" in plan  # salt participates in the join keys


def test_salted_skew_join_guards(spark):
    import pytest as _pytest

    from ves_spark.operators.joins import salted_skew_join

    big, small = _skewed_fix(spark)
    with _pytest.raises(ValueError, match="inner"):
        salted_skew_join(big, small, "key", how="right")
    with _pytest.raises(ValueError, match="n_salts"):
        salted_skew_join(big, small, "key", n_salts=0)
    # n_salts=1 degenerates to the plain join
    got = salted_skew_join(big, small, "key", n_salts=1).count()
    assert got == big.join(small, "key").count()


def test_salted_skew_join_null_salt_expr_keeps_rows(spark):
    """A caller-supplied salt_expr that evaluates NULL must not drop
    rows (NULL join keys match nothing) — coalesced to salt 0."""
    from ves_spark.operators.joins import salted_skew_join

    big = spark.createDataFrame(
        [(1, "hot"), (None, "hot"), (None, "k0"), (4, "miss")],
        "uid long, key string",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k0", "A")], "key string, attr string"
    )
    got = salted_skew_join(
        big, small, "key", n_salts=4, salt_expr=F.xxhash64("uid")
    )
    want = big.join(small, "key")
    assert got.count() == want.count() == 3
    assert (
        salted_skew_join(
            big, small, "key", n_salts=4, how="left",
            salt_expr=F.xxhash64("uid"),
        ).count()
        == big.join(small, "key", "left").count()
    )


def test_dedup_against_history_rejects_bad_expected_keys(spark):
    import pytest as _pytest

    from ves_spark.operators.bloom import dedup_against_history

    hist = spark.createDataFrame([("h1", "a")], "doc_id string, text string")
    new = spark.createDataFrame([("n1", "b")], "doc_id string, text string")
    with _pytest.raises(ValueError, match="expected_keys"):
        dedup_against_history(new, hist, expected_keys=0)


def test_cli_alerts_flag_writes_alert_table(spark, tmp_path):
    """--alerts makes the batch alerting user-reachable: score the
    finalized rollup (gap-filled spike+drop detector) and land the
    flagged buckets next to the run's other outputs."""
    from ves_spark import __main__ as cli
    from ves_spark.synth import write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 8_000, seed=7)
    out = str(tmp_path / "out")
    cli.main([
        "--sequences", f"{fix}/sequences.parquet",
        "--source-meta", f"{fix}/source_meta.parquet",
        "--route-rules", f"{fix}/route_rules.parquet",
        "--out", out, "--units", "2", "--units-per-increment", "2",
        "--alerts",
    ])
    al = spark.read.parquet(f"{out}/alerts")
    assert {"sink", "source", "time_bucket", "is_spike", "is_drop"} <= set(
        al.columns
    )
    # every flagged row is flagged for a reason the schema exposes
    assert al.filter("NOT is_spike AND NOT is_drop").count() == 0
