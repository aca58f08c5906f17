#!/usr/bin/env python
"""Measurement-only scale-up of the driver testdata (guide §1: measure
at the scale you optimize for).

The driver's round-end bench may run at a larger, driver-generated
scale factor (BENCH_r06.json: sf=1.0 — lineitem 6M, documents 50k,
events 1M rows). That data is not on disk between rounds, so this
script synthesizes a statistically matching replica from
/root/testdata/sf0.1 for local measurement:

* relational tables (customer/orders/lineitem/part/supplier/events)
  are replicated K times with consistent key offsets (all keys are
  contiguous 0..N-1, so offset = replica * N preserves every join
  relationship and per-key group sizes);
* documents are FRESH draws from the empirical process (uniform words
  over the observed vocabulary, uniform 10..100 length, 5% planted
  near-dups carrying an inserted "dup" token, ~0.16% exact dups,
  empirical lang/source marginals) — verbatim replication would give
  every text 10 identical copies and quadratically distort the
  pair-generation queries this round optimizes;
* embeddings are fresh unit-norm gaussian vectors (matching the
  observed mean-0, std 1/sqrt(64), |v|=1 marginals), replica 0 kept
  verbatim so vec_id<10 query sets stay identical.

Deterministic (seed derived from replica index). Output is NEVER read
by bench.py/queries unless SPARK_GRAFT_SF_DIR points at it explicitly.

Usage: python BENCH/make_sfx.py [--k 10] [--out /tmp/sfx1.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

REL_TABLES = {
    # table -> {column: key-space-size table it indexes}
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_users"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sfx1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    sizes = {}
    for t in ["customer", "supplier", "part", "orders", "events"]:
        sizes[t] = pq.ParquetFile(f"{SRC}/{t}.parquet").metadata.num_rows
    sizes["_users"] = 1500  # user_id is 0..1499 at sf0.1

    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{args.out}/{t}.parquet")

    for t, keys in REL_TABLES.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(args.k):
            tbl = base
            for col, space in keys.items():
                off = r * sizes[space]
                if off:
                    tbl = tbl.set_column(
                        tbl.column_names.index(col),
                        col,
                        pc.add(base.column(col), off),
                    )
            reps.append(tbl)
        pq.write_table(pa.concat_tables(reps), f"{args.out}/{t}.parquet")
        print(t, "->", args.k * base.num_rows, "rows")

    # ---- documents: fresh draws from the empirical process
    docs = pq.read_table(f"{SRC}/documents.parquet")
    vocab = sorted(
        {
            w
            for t_ in docs.column("text").to_pylist()[:500]
            for w in t_.split()
            if w != "dup"
        }
    )
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    n0 = docs.num_rows
    out_tables = [docs]
    for r in range(1, args.k):
        rng = np.random.default_rng(911_000 + r)
        n_near, n_exact = n0 // 20, max(1, round(n0 * 8 / 5000))
        n_fresh = n0 - n_near - n_exact
        lens = rng.integers(10, 101, size=n_fresh)
        texts = [
            " ".join(np.asarray(vocab)[rng.integers(0, len(vocab), size=ln)])
            for ln in lens
        ]
        for _ in range(n_near):  # near-copy with an inserted dup token
            src_i = int(rng.integers(0, n_fresh))
            w = texts[src_i].split()
            w.insert(int(rng.integers(0, len(w) + 1)), "dup")
            texts.append(" ".join(w))
        for _ in range(n_exact):
            texts.append(texts[int(rng.integers(0, n_fresh))])
        perm = rng.permutation(n0)
        texts = [texts[i] for i in perm]
        out_tables.append(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(n0, dtype=np.int64) + r * n0
                    ),
                    "text": pa.array(texts),
                    "lang": pa.array(
                        [langs[int(i)] for i in rng.integers(0, n0, size=n0)]
                    ),
                    "source": pa.array(
                        [sources[int(i)] for i in rng.integers(0, n0, size=n0)]
                    ),
                    "n_chars": pa.array(
                        np.array([len(t_) for t_ in texts], dtype=np.int64)
                    ),
                }
            )
        )
    pq.write_table(pa.concat_tables(out_tables), f"{args.out}/documents.parquet")
    print("documents ->", args.k * n0, "rows (fresh draws)")

    # ---- embeddings: fresh unit-norm vectors, replica 0 verbatim
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    ne, dim = emb.num_rows, len(emb.column("embedding")[0])
    labels = emb.column("label").to_numpy()
    out_tables = [emb]
    for r in range(1, args.k):
        rng = np.random.default_rng(922_000 + r)
        v = rng.standard_normal((ne, dim))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        out_tables.append(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(ne, dtype=np.int64) + r * ne),
                    "embedding": pa.array(
                        list(v.astype(np.float32)),
                        type=pa.list_(pa.float32()),
                    ),
                    "label": pa.array(
                        labels[rng.integers(0, ne, size=ne)], type=pa.int32()
                    ),
                }
            )
        )
    pq.write_table(pa.concat_tables(out_tables), f"{args.out}/embeddings.parquet")
    print("embeddings ->", args.k * ne, "rows")


if __name__ == "__main__":
    main()
