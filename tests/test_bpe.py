"""Distributed BPE trainer/encoder vs the textbook scalar reference."""

import pytest

from ves_spark.operators.bpe import (
    apply_bpe,
    ref_apply_bpe,
    ref_train_bpe,
    train_bpe,
)

CORPUS = [
    [1, 2, 1, 2, 3],          # (1,2) twice
    [1, 2, 2, 2, 1, 2],       # overlapping (2,2) run
    [3, 3, 3, 3],             # (3,3) run: greedy pairs -> 2 counts
    [1],                       # singleton: no pairs
    [],                        # empty doc
    [2, 1, 2, 1, 2],          # ties with (1,2)
]


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, tokens array<int>"
    )


def test_train_bpe_matches_scalar_reference(spark):
    got = train_bpe(_df(spark, CORPUS), n_merges=6, checkpoint_every=2)
    want = ref_train_bpe(CORPUS, n_merges=6)
    assert got == want
    assert len(got) >= 3  # non-vacuous: several merges actually fire


def test_train_bpe_early_stop_on_min_count(spark):
    docs = [[1, 2], [3, 4], [5, 6]]  # every pair unique
    assert train_bpe(_df(spark, docs), n_merges=5, min_count=2) == []
    assert ref_train_bpe(docs, n_merges=5, min_count=2) == []


def test_apply_bpe_matches_scalar_reference(spark):
    merges = ref_train_bpe(CORPUS, n_merges=6)
    out = {
        r["doc_id"]: list(r["tokens"])
        for r in apply_bpe(_df(spark, CORPUS), merges).collect()
    }
    for i, d in enumerate(CORPUS):
        assert out[i] == ref_apply_bpe(d, merges), f"doc {i}"


def test_apply_bpe_overlapping_runs_left_greedy(spark):
    # a a a with merge (a,a)->m must give [m, a], never [a, m]
    merges = [(7, 7, 99)]
    out = apply_bpe(_df(spark, [[7, 7, 7]]), merges).collect()[0]["tokens"]
    assert list(out) == [99, 7] == ref_apply_bpe([7, 7, 7], merges)


def test_bpe_roundtrip_property(spark):
    """Randomized corpora: Spark trainer and encoder equal the scalar
    reference end-to-end (seeded, deterministic)."""
    import random

    rng = random.Random(1234)
    for trial in range(3):
        docs = [
            [rng.randrange(5) for _ in range(rng.randrange(0, 14))]
            for _ in range(25)
        ]
        want_merges = ref_train_bpe(docs, n_merges=5)
        got_merges = train_bpe(
            _df(spark, docs), n_merges=5, checkpoint_every=3
        )
        assert got_merges == want_merges, f"trial {trial}"
        enc = {
            r["doc_id"]: list(r["tokens"])
            for r in apply_bpe(_df(spark, docs), got_merges).collect()
        }
        for i, d in enumerate(docs):
            assert enc[i] == ref_apply_bpe(d, want_merges), (trial, i)


def test_apply_bpe_pandas_matches_scalar_reference(spark):
    from ves_spark.operators.bpe import apply_bpe_pandas

    merges = ref_train_bpe(CORPUS, n_merges=6)
    out = {
        r["doc_id"]: list(r["tokens"])
        for r in apply_bpe_pandas(_df(spark, CORPUS), merges).collect()
    }
    for i, d in enumerate(CORPUS):
        assert out[i] == ref_apply_bpe(d, merges), f"doc {i}"


def test_apply_bpe_rejects_large_merge_tables(spark):
    from ves_spark.operators.bpe import apply_bpe

    merges = [(i, i + 1, 1000 + i) for i in range(65)]
    with pytest.raises(ValueError, match="apply_bpe_pandas"):
        apply_bpe(_df(spark, CORPUS), merges)


def test_apply_bpe_pandas_large_merge_table(spark):
    """A merge table far past the SQL-fold cap encodes fine through
    the Arrow kernel and still matches the scalar reference."""
    import random

    from ves_spark.operators.bpe import apply_bpe_pandas

    rng = random.Random(9)
    docs = [[rng.randrange(6) for _ in range(30)] for _ in range(10)]
    merges = ref_train_bpe(docs, n_merges=200, min_count=2)
    assert len(merges) > 64 or len(merges) > 0
    out = {
        r["doc_id"]: list(r["tokens"])
        for r in apply_bpe_pandas(_df(spark, docs), merges).collect()
    }
    for i, d in enumerate(docs):
        assert out[i] == ref_apply_bpe(d, merges), f"doc {i}"
