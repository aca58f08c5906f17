import numpy as np

from ves_spark.synth import HOT_SHARE, MAX_LEN, MIN_LEN, SOURCES, make_sequences
from ves_spark.schema import VOCAB


def test_deterministic():
    a = make_sequences(1000, seed=42)
    b = make_sequences(1000, seed=42)
    assert a.equals(b)


def test_shape_and_invariants(seq_pdf):
    assert list(seq_pdf.columns) == ["doc_id", "tokens", "n_tok", "source"]
    assert seq_pdf["doc_id"].is_unique
    lens = seq_pdf["tokens"].map(len)
    # n_tok conservation (FIXTURES.md §A)
    assert (lens == seq_pdf["n_tok"]).all()
    assert lens.min() >= MIN_LEN and lens.max() <= MAX_LEN
    allvals = np.concatenate(seq_pdf["tokens"].to_list())
    assert allvals.min() >= 0 and allvals.max() < VOCAB
    assert allvals.dtype == np.int32


def test_skew(seq_pdf):
    share = (seq_pdf["source"] == "src-hot").mean()
    assert abs(share - HOT_SHARE) < 0.03
    assert set(seq_pdf["source"].unique()) <= set(SOURCES)
