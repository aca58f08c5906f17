"""Local replica of the driver's correctness harness: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row count, column names, and
order-insensitive values (exact for non-floats, tiny tolerance for
floats — the driver hashes, so both sides round inside the query)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _query_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()

    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [r.asDict() for r in sdf.collect()]

    if name not in oracles:
        # rows-only check (non-SQL-expressible op): must actually
        # produce rows with a non-empty schema — the driver's own
        # smoke check requires rows > 0
        assert len(spark_rows) > 0, f"{name}: no-oracle query returned 0 rows"
        assert spark_cols, f"{name}: empty schema"
        return

    con = _duck(SF_DIR)
    res = con.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [dict(zip(duck_cols, row)) for row in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} != {len(duck_rows)}"
    )
    cols = sorted(spark_cols)
    a = _normalize(spark_rows, cols)
    b = _normalize(duck_rows, cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: {len(mism)} mismatched rows, first: {a[mism[0]]} vs {b[mism[0]]}"


@pytest.mark.parametrize(
    "name",
    [
        "semi_anti_join_customers",
        "user_set_summary",
        "scalar_functions",  # absorbed scalar_subquery_outliers (fold #7)
        "dup_span_coverage_docs",
    ],
)
def test_query_not_vacuous(spark, name):
    """Regression guard (round-2 verdict 'What's wrong #2'): these
    queries once returned 0 rows at sf0.01, making their oracle match
    vacuous. Pin that each returns actual data."""
    import __spark_entry__ as entry_mod

    assert entry_mod.queries()[name](spark, SF_DIR).count() > 0


def test_scalar_functions_outlier_leg_not_vacuous(spark):
    """The folded outlier leg specifically (not just the union) must
    select rows — the *1.2 threshold exists because *2 was vacuous."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["scalar_functions"](spark, SF_DIR)
    assert df.filter("scope = 'outlier'").count() > 0
    assert df.filter("scope = 'scalar'").count() > 0


def test_rate_spikes_rollup_both_flags_nonvacuous(spark):
    """The spike/drop query must exercise both code paths at sf0.01:
    filled zero buckets exist (drops possible) and scored rows with a
    real baseline exist."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["rate_spikes_rollup"](spark, SF_DIR)
    assert df.count() > 0
    # gap-filled zero buckets must actually exist at sf0.01 — `>= 0`
    # here was vacuously true (ADVICE r5)
    assert df.filter("cnt = 0").count() > 0
    assert df.filter("base_n >= 3").count() > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
