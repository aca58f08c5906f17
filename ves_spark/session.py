"""SparkSession factory with scale-aware defaults.

Local mode is a stand-in for a multi-executor cluster: every config
here is chosen so the same code runs unchanged under
``spark-submit --py-files`` on a real cluster (AQE on, explicit
shuffle partitioning, Arrow enabled, UTC timezone pinned for oracle
comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "ves_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster, ``master`` comes from spark-submit and this
    function only layers SQL configs; locally it defaults to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions if shuffle_partitions is not None else cpus

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # shuffle partitions ~ cores locally; AQE coalesces at scale.
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scan parallelism floor (guide §6): minPartitionNum derives
        # split sizes from input_bytes / cores, so a compute-heavy
        # scan over a byte-small table (a 10 MB parquet of documents
        # whose shingle self-join fans out 100M pairs) is not pinned
        # to 1-2 tasks by the 128 MB default split. openCostInBytes
        # is the per-file padding that FLOORS split size; the 4 MB
        # default models slow remote opens — for local/page-cached
        # parquet it throttles small-table parallelism, so it is
        # parameterised with a small local default. Both knobs scale
        # with the session's core count, never a literal constant.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(512 * 1024)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # broadcast threshold: dims (source_meta, nation, region...) are tiny
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # HotSpot refuses to JIT methods over 8000 bytecodes
        # (DontCompileHugeMethods); Spark's default hugeMethodLimit
        # (65535) happily emits bigger fused whole-stage methods, which
        # then run INTERPRETED — measured 10-30x slowdowns with wild
        # variance on this pipeline's fused parse->enrich->route stage.
        # Capping at 8000 makes Spark split codegen at sane boundaries.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # percentile sketches: the ObjectHashAggregate sort-based
        # fallback triggers after 128 keys/partition by default and
        # turns hash aggregation into a full sort — our rollup keys
        # are high-cardinality by design, so keep it hash-based.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
