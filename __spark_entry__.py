"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``ves_spark.queries`` (the operator registry) and
``ves_spark.pipeline`` (the flagship parse→enrich→route→aggregate
pipeline). The driver's verify runs ``entry(spark)`` as a smoke check,
runs each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full parse→enrich→route→aggregate pipeline over a
    deterministic token table (BASELINE.json input_hint shape), ending
    in the per-sink rollup. Uses sf0.001-scale synthetic input."""
    import tempfile

    from ves_spark.pipeline import Pipeline, PipelineConfig
    from ves_spark.synth import write_fixture

    work = tempfile.mkdtemp(prefix="ves_entry_")
    fix = os.path.join(work, "fixture")
    write_fixture(fix, 6_000, seed=42)
    conf = PipelineConfig(
        sequences_path=os.path.join(fix, "sequences.parquet"),
        source_meta_path=os.path.join(fix, "source_meta.parquet"),
        route_rules_path=os.path.join(fix, "route_rules.parquet"),
        out_dir=os.path.join(work, "out"),
        n_units=4,
        units_per_increment=4,
        run_id="entry-run",
    )
    p = Pipeline(spark, conf)
    p.run()
    return p.finalize_rollup()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ves_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from ves_spark import queries as q

    return q.oracle_sql()
