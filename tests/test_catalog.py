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
