import pytest

from pyspark.sql import functions as F

from ves_spark.sources.catalog import IcebergCatalog, ParquetCatalog, get_catalog


def test_parquet_catalog_roundtrip(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path))
    df = spark.range(100).withColumn("p", F.col("id") % 4)
    cat.append(df, "t", ["p"])
    assert cat.read(spark, "t").count() == 100
    cat.append(df, "t", ["p"])
    assert cat.read(spark, "t").count() == 200


def test_parquet_catalog_dynamic_overwrite(spark, tmp_path):
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    cat = ParquetCatalog(str(tmp_path))
    df = spark.range(100).withColumn("p", F.col("id") % 4)
    cat.append(df, "t", ["p"])
    # overwrite only partition p=0 with 10 new rows
    repl = spark.range(10).withColumn("p", F.lit(0))
    cat.overwrite_partitions(repl, "t", ["p"])
    out = cat.read(spark, "t")
    assert out.filter(F.col("p") == 0).count() == 10
    assert out.filter(F.col("p") != 0).count() == 75


def test_iceberg_unavailable_falls_back(spark, tmp_path):
    with pytest.raises(RuntimeError, match="Iceberg"):
        IcebergCatalog(spark)
    cat = get_catalog(spark, str(tmp_path))
    assert isinstance(cat, ParquetCatalog)


def test_merge_newer_predicate_matches_emulated_tiebreak():
    """The real-Iceberg MERGE can't run here (no jar), but its
    'source wins' predicate CAN be proven equivalent to the emulated
    merge's ordering: for every (s, t) pair over a small domain,
    DuckDB evaluating the generated SQL must agree with the python
    reference of latest_per_key's (order desc, tiebreak desc, _upd
    desc) rule — i.e. s wins iff (s.o, s.tb) >= (t.o, t.tb)
    lexicographically."""
    import itertools

    import duckdb

    from ves_spark.sources.catalog import newer_or_tie_predicate

    pred = newer_or_tie_predicate(["o", "tb"])
    con = duckdb.connect()
    domain = list(itertools.product([1, 2, 3], repeat=2))
    for (so, stb), (to, ttb) in itertools.product(domain, repeat=2):
        got = con.execute(
            f"SELECT {pred} FROM (SELECT {so} AS o, {stb} AS tb) s, "
            f"(SELECT {to} AS o, {ttb} AS tb) t"
        ).fetchone()[0]
        want = (so, stb) >= (to, ttb)  # lexicographic, tie -> update
        assert got == want, ((so, stb), (to, ttb))

    # single-order-column variant too
    pred1 = newer_or_tie_predicate(["o"])
    for so, to in itertools.product([1, 2, 3], repeat=2):
        got = con.execute(
            f"SELECT {pred1} FROM (SELECT {so} AS o) s, (SELECT {to} AS o) t"
        ).fetchone()[0]
        assert got == (so >= to)
