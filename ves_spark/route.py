"""Route stage: rule table → multi-sink fan-out.

The reference's control-plane router translates one WatcherPayload
into ZERO-OR-MORE TailerEvents — Rotated fans out to
[Stop(old), Start(new)] (reference src/tailer/tailer_events.rs:26-54).
The data-plane generalization here: every rule whose predicate matches
contributes its sink; a row matching k rules is routed to all k sinks
(deduped); a row matching none goes to the default sink.

Implementation is a compiled column expression, not a UDF: the rule
table (config-scale, driver-side) compiles to

    sinks = array_distinct(filter(array(when(p1, s1), ..., when(pn, sn)), NOT NULL))
    sink  = explode(if(empty, [default], sinks))

which stays entirely inside whole-stage codegen — the router costs one
projection at any scale, and the per-sink writers below it are plain
filters that Catalyst can push into the scan when a sink is queried
alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ves_spark.schema import DEFAULT_SINK


def compile_rules(route_rules: DataFrame | list[dict]) -> Column:
    """Compile the rule table into an ``array<string>`` column of
    matched sinks (rule_id order preserved, duplicates removed)."""
    if isinstance(route_rules, DataFrame):
        rules = [r.asDict() for r in route_rules.collect()]
    else:
        rules = list(route_rules)
    rules.sort(key=lambda r: r["rule_id"])
    hits = F.array(
        *[F.when(F.expr(r["predicate"]), F.lit(r["sink"])) for r in rules]
    )
    matched = F.array_distinct(F.filter(hits, lambda x: x.isNotNull()))
    return F.when(F.size(matched) > 0, matched).otherwise(F.array(F.lit(DEFAULT_SINK)))


def route(df: DataFrame, route_rules: DataFrame | list[dict]) -> DataFrame:
    """Add one row per (input row, matched sink) with a ``sink`` column.

    The rule expression is materialized in its own projection BEFORE
    the explode: Spark's Generate operator evaluates its generator
    expression interpreted (no whole-stage codegen) and would evaluate
    the full when/filter/array_distinct chain per row — measured ~15×
    slower. A codegen'd Project computes the array once; Generate then
    explodes a plain attribute.
    """
    return (
        df.withColumn("_sinks", compile_rules(route_rules))
        .withColumn("sink", F.explode(F.col("_sinks")))
        .drop("_sinks")
    )


def sink_names(route_rules: DataFrame | list[dict]) -> list[str]:
    if isinstance(route_rules, DataFrame):
        names = [r["sink"] for r in route_rules.select("sink").distinct().collect()]
    else:
        names = list({r["sink"] for r in route_rules})
    return sorted(set(names) | {DEFAULT_SINK})
