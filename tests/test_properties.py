"""Property-based spot checks (SURVEY.md §5.2): random token arrays
round-trip through parse without loss; routing is exhaustive and
per-sink disjoint. Hypothesis drives the generator; each case builds a
small Spark frame (kept tiny — Spark job per example is expensive, so
examples are batched into one frame per property run)."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ves_spark.parse import parse_builtin
from ves_spark.route import route
from ves_spark.schema import VOCAB

token_arrays = st.lists(
    st.lists(st.integers(min_value=0, max_value=VOCAB - 1), min_size=3, max_size=64),
    min_size=1,
    max_size=25,
)


def _df(spark, arrays):
    tbl = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(len(arrays))],
            "tokens": pa.array(arrays, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(a) for a in arrays], type=pa.int32()),
            "source": ["src-hot"] * len(arrays),
        }
    )
    return spark.createDataFrame(tbl.to_pandas())


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(arrays=token_arrays)
def test_parse_conserves_payload(spark, arrays):
    out = parse_builtin(_df(spark, arrays)).select("doc_id", "tokens", "n_tok").collect()
    by_id = {r["doc_id"]: r for r in out}
    for i, a in enumerate(arrays):
        r = by_id[f"d{i}"]
        assert list(r["tokens"]) == a  # token-array equality
        assert r["n_tok"] == len(a)  # size conservation


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(arrays=token_arrays)
def test_parse_fields_in_domain(spark, arrays):
    rows = parse_builtin(_df(spark, arrays)).collect()
    for r in rows:
        assert 0 <= r["level_id"] < 8
        assert 1 <= r["status_class"] <= 5
        assert r["status_code"] // 100 == r["status_class"]
        assert r["time_bucket"] <= r["ts"]


RULES = [
    {"rule_id": 1, "predicate": "level IN ('ERROR','CRITICAL','FATAL')", "sink": "a"},
    {"rule_id": 2, "predicate": "status_class = 5", "sink": "b"},
]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(arrays=token_arrays)
def test_route_exhaustive_disjoint(spark, arrays):
    routed = route(parse_builtin(_df(spark, arrays)), RULES)
    pdf = routed.select("doc_id", "sink").toPandas()
    # exhaustive: every input row routed somewhere
    assert set(pdf["doc_id"]) == {f"d{i}" for i in range(len(arrays))}
    # disjoint per sink: no (row, sink) duplicate
    assert not pdf.duplicated(["doc_id", "sink"]).any()


def test_route_default_only_when_no_match(spark):
    arrays = [[5, 0, 0, 9]]  # level_id=5 -> ERROR; status_class=1
    routed = route(parse_builtin(_df(spark, arrays)), RULES)
    sinks = sorted(r["sink"] for r in routed.select("sink").collect())
    assert sinks == ["a"]  # matched -> no sink_default row


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ev=st.lists(st.integers(min_value=0, max_value=500_000), min_size=1, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=59), max_size=6),
    gap=st.sampled_from([1, 10_000, 60_000]),
)
def test_merge_sessions_batch_split_invariant(ev, cuts, gap):
    """THE streaming==batch guarantee: folding events chunk-by-chunk
    through merge_sessions (how micro-batches hit the state store,
    any chunking, any order) must equal one-shot merging of all
    events. This is what makes the stateful operator's output equal
    the batch sessionization regardless of how the stream slices the
    input — late/bridging arrivals included."""
    import numpy as np

    from ves_spark.streaming.stateful import merge_sessions

    empty = np.empty(0, np.int64)
    one_shot = merge_sessions(
        empty, empty, empty, np.asarray(ev, np.int64), gap
    )

    bounds = sorted({c for c in cuts if c < len(ev)})
    chunks = []
    prev = 0
    for b in bounds + [len(ev)]:
        if b > prev:
            chunks.append(ev[prev:b])
            prev = b
    st_, en_, nn_ = empty, empty, empty
    for ch in chunks:
        st_, en_, nn_ = merge_sessions(
            st_, en_, nn_, np.asarray(ch, np.int64), gap
        )
    assert st_.tolist() == one_shot[0].tolist()
    assert en_.tolist() == one_shot[1].tolist()
    assert nn_.tolist() == one_shot[2].tolist()
    assert int(nn_.sum()) == len(ev)


# =====================================================================
# Exact-substring dedup vs a naive O(n * len^2) reference
# =====================================================================


def _naive_dup_coverage(arrays, k, min_count=2):
    """Independent scalar reference for duplicate_span_coverage: count
    every k-gram tuple globally, mark hit positions, merge intervals,
    sum coverage."""
    from collections import Counter

    grams = Counter()
    for a in arrays:
        for i in range(len(a) - k + 1):
            grams[tuple(a[i : i + k])] += 1
    out = {}
    for idx, a in enumerate(arrays):
        covered = set()
        spans = []
        for i in range(len(a) - k + 1):
            if grams[tuple(a[i : i + k])] >= min_count:
                covered.update(range(i, i + k))
        if covered:
            pos = sorted(covered)
            n_spans = 1 + sum(
                1 for x, y in zip(pos, pos[1:]) if y > x + 1
            )
            out[idx] = (len(a), n_spans, len(covered))
    return out


# small token domain so duplicate k-grams actually occur
dup_arrays = st.lists(
    st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=24),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(arrays=dup_arrays, k=st.integers(min_value=2, max_value=4))
def test_dup_span_coverage_matches_naive(spark, arrays, k):
    from ves_spark.operators.token_dedup import duplicate_span_coverage

    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "doc_id long, tokens array<int>"
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["n_spans"], r["dup_tokens"])
        for r in duplicate_span_coverage(df, k=k).collect()
    }
    assert got == _naive_dup_coverage(arrays, k)


# ---------------------------------------------------------------------
# Bucketized range join == naive interval containment
# ---------------------------------------------------------------------

_coords = st.integers(min_value=-50, max_value=50)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    points=st.lists(_coords, min_size=1, max_size=20),
    intervals=st.lists(st.tuples(_coords, _coords), min_size=1, max_size=12),
    width=st.sampled_from([1.0, 3.0, 7.0, 64.0]),
)
def test_bucketed_range_join_equals_naive(spark, points, intervals, width):
    """Any geometry (inverted/empty intervals, negative coordinates,
    widths smaller and larger than every interval): the bucketized
    equi-join returns exactly the naive containment pairs."""
    from ves_spark.operators.joins import bucketed_range_join

    p_df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(points)], "pid long, p double"
    )
    i_df = spark.createDataFrame(
        [(j, float(s), float(e)) for j, (s, e) in enumerate(intervals)],
        "iid long, s double, e double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in bucketed_range_join(p_df, i_df, "p", "s", "e", width).collect()
    )
    want = sorted(
        (i, j)
        for i, x in enumerate(points)
        for j, (s, e) in enumerate(intervals)
        if s <= x < e
    )
    assert got == want


# --------------------------------------------------------- salted join
_keys = st.sampled_from(["hot", "k1", "k2", "k3", "missing"])
_big_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _keys), min_size=1, max_size=40
)
_small_rows = st.lists(
    st.tuples(_keys, st.integers(0, 99)), min_size=0, max_size=10
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(big=_big_rows, small=_small_rows, n_salts=st.integers(1, 7))
def test_salted_join_equals_plain_join(spark, big, small, n_salts):
    """For ANY frames (dup keys both sides, missing keys, any salt
    count), the salted join is row-for-row the plain join — salts are
    pure placement, never semantics."""
    from ves_spark.operators.joins import salted_skew_join

    b = spark.createDataFrame(big, "rid long, key string")
    s = spark.createDataFrame(small, "key string, attr long") if small else (
        spark.createDataFrame([], "key string, attr long")
    )
    for how in ("inner", "left"):
        got = (
            salted_skew_join(b, s, "key", n_salts=n_salts, how=how)
            .groupBy("rid", "key", "attr").count().collect()
        )
        want = (
            b.join(s, "key", how)
            .groupBy("rid", "key", "attr").count().collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


# ----------------------------------------------------------- PSI drift
_cat_counts = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]), st.integers(1, 50),
    min_size=1, max_size=4,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(p=_cat_counts, q=_cat_counts)
def test_psi_nonnegative_zero_iff_equal(spark, p, q):
    """PSI >= 0 always; == 0 exactly when the two share distributions
    (it is an f-divergence). Symmetric ONLY when both snapshots share
    a support: the category set is deliberately anchored to the
    REFERENCE side, so differing supports fold differently by design
    (a new epoch must not define its own yardstick)."""
    from ves_spark.operators.drift import population_stability

    mk = lambda cnts: spark.createDataFrame(  # noqa: E731
        [(k,) for k, n in cnts.items() for _ in range(n)], "src string"
    )
    fwd = population_stability(mk(p), mk(q), categorical_cols=["src"])["src"]
    assert fwd >= 0
    if set(p) == set(q):  # equal supports -> one shared yardstick
        rev = population_stability(mk(q), mk(p), categorical_cols=["src"])["src"]
        assert abs(fwd - rev) < 1e-9
    tp, tq = sum(p.values()), sum(q.values())
    same_dist = {k: p.get(k, 0) / tp for k in "abcd"} == {
        k: q.get(k, 0) / tq for k in "abcd"
    }
    assert (fwd < 1e-12) == same_dist


# ------------------------------------------------------------ gap fill
_series_rows = st.lists(
    st.tuples(st.sampled_from(["s1", "s2"]), st.integers(0, 40),
              st.integers(1, 100)),
    min_size=1, max_size=30, unique_by=lambda r: (r[0], r[1]),
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_series_rows)
def test_fill_gaps_mass_and_grid_invariants(spark, rows):
    """Densifying never changes total mass, keeps every real bucket,
    and every series ends exactly at the global max bucket."""
    from ves_spark.operators.drift import population_stability  # noqa: F401
    from ves_spark.operators.anomaly import fill_bucket_gaps

    df = spark.createDataFrame(rows, "sink string, t long, cnt long")
    filled = fill_bucket_gaps(df, ["sink"], time_col="t", bucket_width=1)
    got = {(r["sink"], r["t"]): r["cnt"] for r in filled.collect()}
    gmax = max(t for _s, t, _c in rows)
    for s, t, c in rows:
        assert got[(s, t)] == c  # real buckets intact
    assert sum(got.values()) == sum(c for _s, _t, c in rows)
    for s in {r[0] for r in rows}:
        lo = min(t for s2, t, _c in rows if s2 == s)
        ts = sorted(t for (s2, t) in got if s2 == s)
        assert ts == list(range(lo, gmax + 1))  # dense to the horizon
