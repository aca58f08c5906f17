"""Exact-substring (k-token window) dedup: planted-span layout tests,
xxhash64/md5 mode equivalence, and the strip (cleaning) variant.

The corpus-level statistic itself is driver-oracled end-to-end by the
``dup_span_coverage_docs`` entry in tests/test_entry_oracle.py; these
tests pin the span geometry on hand-built token arrays where the
correct intervals are computable by eye.
"""

from __future__ import annotations

import pytest

from ves_spark.operators.token_dedup import (
    duplicate_span_coverage,
    duplicate_spans,
    strip_duplicate_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


@pytest.fixture(scope="module")
def planted(spark):
    # doc 1 and doc 2 share tokens 100..107 (8 tokens => 4 dup 5-grams
    # in each doc, overlapping => ONE merged span of 8 tokens).
    # doc 3 repeats 500..504 twice WITHIN itself (intra-doc dup, two
    # disjoint spans). doc 4 is unique. doc 5 is shorter than k.
    return _df(
        spark,
        [
            (1, [1, 2, 100, 101, 102, 103, 104, 105, 106, 107, 3, 4]),
            (2, [9, 100, 101, 102, 103, 104, 105, 106, 107, 8, 7, 6, 5]),
            (3, [500, 501, 502, 503, 504, 42, 43, 500, 501, 502, 503, 504]),
            (4, [61, 62, 63, 64, 65, 66, 67, 68]),
            (5, [70, 71, 72]),
        ],
    )


def _span_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    return out


def test_planted_spans_merge_and_positions(spark, planted):
    spans = _span_map(duplicate_spans(planted, k=5).collect())
    # doc 1: shared run at offsets 2..9 -> one merged span.
    assert spans[1] == {(2, 9, 8)}
    # doc 2: same run at offsets 1..8.
    assert spans[2] == {(1, 8, 8)}
    # doc 3: intra-doc repeat -> gram at 0 and at 7, gap 7 > k -> two
    # disjoint 5-token spans.
    assert spans[3] == {(0, 4, 5), (7, 11, 5)}
    # docs 4 (unique) and 5 (< k tokens) have no spans at all.
    assert 4 not in spans and 5 not in spans


def test_coverage_rollup(spark, planted):
    cov = {
        r["doc_id"]: (r["n_tok"], r["n_spans"], r["dup_tokens"], r["dup_frac"])
        for r in duplicate_span_coverage(planted, k=5).collect()
    }
    assert cov[1] == (12, 1, 8, round(8 / 12, 4))
    assert cov[2] == (13, 1, 8, round(8 / 13, 4))
    assert cov[3] == (12, 2, 10, round(10 / 12, 4))
    assert set(cov) == {1, 2, 3}


def test_md5_mode_matches_xxhash64(spark, planted):
    a = _span_map(duplicate_spans(planted, k=5, hash_mode="xxhash64").collect())
    b = _span_map(duplicate_spans(planted, k=5, hash_mode="md5").collect())
    assert a == b


def test_min_count_threshold(spark, planted):
    # Every planted gram occurs exactly twice; min_count=3 finds none.
    assert duplicate_spans(planted, k=5, min_count=3).count() == 0


def test_strip_removes_exactly_covered_positions(spark, planted):
    cleaned = {
        r["doc_id"]: r["tokens"]
        for r in strip_duplicate_spans(planted, k=5).collect()
    }
    assert cleaned[1] == [1, 2, 3, 4]
    assert cleaned[2] == [9, 8, 7, 6, 5]
    assert cleaned[3] == [42, 43]
    # Untouched docs come back byte-identical (left join path).
    assert cleaned[4] == [61, 62, 63, 64, 65, 66, 67, 68]
    assert cleaned[5] == [70, 71, 72]


def test_keep_first_not_implemented(spark, planted):
    with pytest.raises(NotImplementedError):
        strip_duplicate_spans(planted, k=5, keep_first=True)


def test_bad_hash_mode_raises(spark, planted):
    with pytest.raises(ValueError):
        duplicate_spans(planted, k=5, hash_mode="sha1").collect()


def test_adjacent_windows_merge_exact_boundary(spark):
    # Two dup grams at pos 0 and pos k exactly (pos == prev + k):
    # intervals [0, k-1] and [k, 2k-1] are ADJACENT -> one span.
    k = 5
    df = _df(
        spark,
        [
            (1, list(range(100, 110))),          # grams at 0..5
            (2, list(range(100, 105)) + [999] * 7 + list(range(105, 110))),
        ],
    )
    # doc2 shares gram (100..104) at pos 0 and gram (105..109) at its
    # tail; doc1 has the full run. In doc1 every window is a dup of
    # something? No: doc1 grams 1..4 span the 104|105 boundary, which
    # doc2 never contains -> doc1 gets TWO hits at pos 0 and pos 5,
    # exactly adjacent, merging into one 10-token span.
    spans = _span_map(duplicate_spans(df, k=k).collect())
    assert spans[1] == {(0, 9, 10)}
