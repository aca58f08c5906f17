"""Pipeline driver: the reference's run loop (SURVEY.md §3.4), batch +
resumable.

Per increment (a batch of doc_id hash-bucket units):

    read input (only pending units)        # discovery + anti-join dedup
      -> parse -> enrich -> route          # the normalization stages
      -> write routed rows per (sink, unit)     [dynamic partition overwrite]
      -> write per-unit rollup partials
      -> append lineage rows  (LAST — ADR write-ahead invariant 4)

A killed run resumes by recomputing pending = all_units − committed
(reference dedup-by-inode, discovery.rs:33-35). Orphaned output from a
crashed increment is overwritten — never double-counted — because
writes are scoped to the unit's partition directories and a unit only
counts once its lineage row exists.

Scale notes (local[N] here, 1000 executors in production):
* Unit selection in production is Iceberg partition pruning on a
  bucket(doc_id) partition of the table — metadata-only. On raw
  parquet fixtures it degrades to a scan-filter; semantics identical.
* The whole parse→enrich→route path is one narrow stage: no shuffle
  anywhere before the per-sink writes (parse is a projection, enrich a
  broadcast join, route a projection+explode). A 100 TB run shuffles
  exactly once — the rollup groupBy — and that shuffle carries only
  map-side partials.
* ``repartition(write_partitions, doc_id)`` before the write gives the
  bucketed-by-doc_id layout the north_star mandates and bounds file
  counts; sizes scale by configuring units × write_partitions, not by
  code change.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ves_spark.checkpoint import LineageStore, pending_units, unit_col
from ves_spark.enrich import enrich
from ves_spark.parse import parse
from ves_spark.route import route


@dataclass
class PipelineConfig:
    sequences_path: str
    source_meta_path: str
    route_rules_path: str
    out_dir: str
    n_units: int = 8
    units_per_increment: int = 4
    parse_impl: str = "builtin"  # 'builtin' | 'arrow'
    write_partitions: int = 0  # 0 = one output partition per unit
    run_id: str = "run-0"
    extra: dict = field(default_factory=dict)


class Pipeline:
    def __init__(self, spark: SparkSession, conf: PipelineConfig):
        self.spark = spark
        self.conf = conf
        self.store = LineageStore(f"{conf.out_dir}/lineage")
        # Overwrite only the partitions present in the written frame —
        # the mechanism that makes crashed-increment output harmless.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # ------------------------------------------------------------ stages
    def transform(self, seq: DataFrame) -> DataFrame:
        """parse -> enrich -> route on an already-scoped input frame."""
        meta = self.spark.read.parquet(self.conf.source_meta_path)
        rules = self.spark.read.parquet(self.conf.route_rules_path)
        parsed = parse(seq, self.conf.parse_impl)
        enriched = enrich(parsed, meta)
        return route(enriched, rules)

    def _read_units(self, units: list[int]) -> DataFrame:
        seq = self.spark.read.parquet(self.conf.sequences_path)
        seq = seq.withColumn("unit_id", unit_col(self.conf.n_units))
        return seq.filter(F.col("unit_id").isin(units))

    # ------------------------------------------------------------- run
    def run(self, fail_after_units: int | None = None) -> dict:
        """Process all pending units in increments; returns run stats.

        ``fail_after_units`` simulates a crash (tests): raises after
        that many units have committed, mid-run.
        """
        t0 = time.monotonic()
        todo = pending_units(self.spark, self.store, self.conf.n_units)
        n_done = 0
        rows_total = 0
        step = self.conf.units_per_increment
        for i in range(0, len(todo), step):
            batch = todo[i : i + step]
            rows_total += self._process_increment(batch)
            n_done += len(batch)
            if fail_after_units is not None and n_done >= fail_after_units:
                raise RuntimeError(f"simulated crash after {n_done} units")
        return {
            "run_id": self.conf.run_id,
            "units_processed": n_done,
            "rows_routed": rows_total,
            "wall_sec": time.monotonic() - t0,
        }

    def _process_increment(self, units: list[int]) -> int:
        conf = self.conf
        routed = self.transform(self._read_units(units))

        nparts = conf.write_partitions or len(units)
        out = routed.repartition(nparts, "doc_id")  # bucketed write on doc_id
        (
            out.write.mode("overwrite")
            .partitionBy("unit_id", "sink")
            .parquet(f"{conf.out_dir}/routed")
        )

        # Rollup partials per unit — algebraic, so the final rollup is a
        # sum over partials (finalize_rollup).
        routed_back = self.spark.read.parquet(f"{conf.out_dir}/routed").filter(
            F.col("unit_id").isin(units)
        )
        partials = (
            routed_back.groupBy("unit_id", "sink", "source", "time_bucket").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
                F.sum(F.col("n_tok").cast("long") * 4).alias("sum_bytes"),
            )
        )
        (
            partials.repartition(1)
            .write.mode("overwrite")
            .partitionBy("unit_id")
            .parquet(f"{conf.out_dir}/rollup_partial")
        )

        # Metrics + lineage — committed LAST (write-ahead invariant 4).
        metrics = (
            routed.groupBy("unit_id", "source")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("n_tok").cast("long") * 4).alias("bytes"),
            )
            .collect()
        )
        snapshot_id = int(time.time() * 1000)
        lineage_rows = [
            {
                "run_id": conf.run_id,
                "stage": "route",
                "unit_id": int(m["unit_id"]),
                "source": m["source"],
                "rows": int(m["rows"]),
                "bytes": int(m["bytes"]),
                "snapshot_id": snapshot_id,
            }
            for m in metrics
        ]
        # Units that produced zero rows still need a lineage row, or
        # they would be reprocessed forever.
        seen = {r["unit_id"] for r in lineage_rows}
        for u in units:
            if u not in seen:
                lineage_rows.append(
                    {
                        "run_id": conf.run_id,
                        "stage": "route",
                        "unit_id": u,
                        "source": None,
                        "rows": 0,
                        "bytes": 0,
                        "snapshot_id": snapshot_id,
                    }
                )
        self.store.append(lineage_rows)
        return sum(r["rows"] for r in lineage_rows)

    # -------------------------------------------------------- finalize
    def routed(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.conf.out_dir}/routed")

    def finalize_rollup(self) -> DataFrame:
        """Merge per-unit partials into the final rollup (counts/sums —
        exact) and attach percentile sketches computed over the routed
        table. Percentile merge over partials would need sketch
        serialization; reading routed (already columnar, pruned to
        n_tok) is the simpler exact-enough finalize at any scale."""
        partials = self.spark.read.parquet(f"{self.conf.out_dir}/rollup_partial")
        exact = partials.groupBy("sink", "source", "time_bucket").agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_n_tok").alias("sum_n_tok"),
            F.sum("sum_bytes").alias("sum_bytes"),
        )
        pctl = (
            self.routed()
            .groupBy("sink", "source", "time_bucket")
            .agg(
                F.percentile_approx("n_tok", [0.5, 0.95, 0.99], 10_000).alias("_p")
            )
            .select(
                "sink",
                "source",
                "time_bucket",
                F.element_at("_p", 1).alias("p50"),
                F.element_at("_p", 2).alias("p95"),
                F.element_at("_p", 3).alias("p99"),
            )
        )
        return exact.join(pctl, ["sink", "source", "time_bucket"])
