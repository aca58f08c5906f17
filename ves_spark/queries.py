"""Driver-contract query registry: every operator from SURVEY.md §2
(and the training-data-pipeline extensions) as a (Spark DataFrame fn,
DuckDB oracle SQL) pair over the driver testdata tables.

Conventions that make the driver's order-insensitive value-hash
comparison deterministic across engines:

* every computed column is aliased identically on both sides;
* float results are ``round(x, N)`` on both sides;
* DuckDB integer ``sum()`` returns HUGEINT — always CAST to BIGINT to
  match Spark's long;
* timestamps are compared as formatted strings (engine-native
  timestamp hashing differs);
* whenever a query limits/top-k's, the ORDER BY is a total order
  (explicit tiebreakers).

Each entry documents which reference behavior (file:line into
/root/reference) or SURVEY §2 row it re-expresses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ves_spark.operators.crossengine import duck_md5_int_sql, spark_md5_int

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


# =====================================================================
# Scan / projection / filter  (SURVEY §2.1 ops 3, 16: source predicate
# + projection; reference src/watcher/discovery.rs:101-116,
# src/tailer/payload.rs:8-19)
# =====================================================================


@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_quantity > 25
    """,
)
def filter_project(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_quantity") > 25)
        ).select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "net_price"
            ),
        )
    )


# =====================================================================
# Hash aggregate (SURVEY §2.2 'Aggregate': prometheus/hdrhistogram
# intent, reference Cargo.toml:62,68) — TPC-H Q1 shape
# =====================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =====================================================================
# Joins: broadcast enrich (SURVEY §2.2 'Lookup enrich'), anti/semi
# (reference dedup-by-inode, discovery.rs:33-35), left+default
# (enrich unknown_tenant path)
# =====================================================================


@register(
    "broadcast_enrich",
    """
    SELECT n.n_name AS nation, e.event_type,
           count(*) AS cnt, round(sum(e.value), 2) AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, e.event_type
    """,
)
def broadcast_enrich(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "semi_anti_join_customers",
    """
    SELECT 'semi' AS side, c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000)
    UNION ALL
    SELECT 'anti' AS side, c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 450000)
    """,
)
def semi_anti_join_customers(spark, sf_dir):
    """LEFT SEMI and LEFT ANTI in one driver check (merged to keep
    the registry within the driver's 50-query cap; both operators
    remain individually visible via the ``side`` marker). Asymmetric
    price thresholds keep both legs non-trivial — every custkey has
    SOME order in the synth data, so an unfiltered anti-join is
    vacuously empty and an unfiltered semi-join is the whole table."""
    c = load(spark, sf_dir, "customer")
    semi = (
        c.join(
            load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000),
            c.c_custkey == F.col("o_custkey"),
            "left_semi",
        ).select(F.lit("semi").alias("side"), "c_custkey", "c_mktsegment")
    )
    anti = (
        c.join(
            load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        ).select(F.lit("anti").alias("side"), "c_custkey", "c_mktsegment")
    )
    return semi.unionByName(anti)


@register(
    "left_join_having_summary",
    """
    SELECT 'seg:' || coalesce(c.c_mktsegment, 'UNKNOWN') AS scope,
           CAST(0 AS BIGINT) AS key_id,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY coalesce(c.c_mktsegment, 'UNKNOWN')
    UNION ALL
    SELECT 'supp' AS scope, l_suppkey AS key_id,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 100 AND sum(l_extendedprice) > 1000000
    """,
)
def left_join_having_summary(spark, sf_dir):
    """LEFT OUTER join with a coalesce default UNION ALL a HAVING
    post-aggregation filter, marked by ``scope`` — merged to keep the
    registry within the driver's 50-query cap while both operator
    families stay individually driver-checked (registry fold #5,
    freeing the slot ``range_join_ship_orders`` now occupies)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    left = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .withColumn("segment", F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.concat(F.lit("seg:"), F.col("segment")).alias("scope"),
            F.lit(0).cast("long").alias("key_id"),
            "cnt",
            "total",
        )
    )
    li = load(spark, sf_dir, "lineitem")
    having = (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
            F.sum("l_extendedprice").alias("_raw"),
        )
        .filter((F.col("cnt") > 100) & (F.col("_raw") > 1000000))
        .select(
            F.lit("supp").alias("scope"),
            F.col("l_suppkey").alias("key_id"),
            "cnt",
            "total",
        )
    )
    return left.unionByName(having)


@register(
    "join_3way_revenue",
    """
    SELECT o.o_orderpriority, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority, n.n_name
    """,
)
def join_3way_revenue(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("o_orderpriority", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# =====================================================================
# Router fan-out (SURVEY §2.1 ops 9/10; reference
# src/tailer/tailer_events.rs:26-54 — one input row, 0..k sinks)
# =====================================================================


@register(
    "route_fanout",
    """
    WITH base AS (SELECT event_id, event_type, value FROM events)
    SELECT event_id, 'sink_errors' AS sink FROM base WHERE event_type = 'error'
    UNION ALL
    SELECT event_id, 'sink_hot' AS sink FROM base WHERE value >= 90
    UNION ALL
    SELECT event_id, 'sink_default' AS sink FROM base
    WHERE NOT (event_type = 'error') AND NOT (value >= 90)
    """,
)
def route_fanout(spark, sf_dir):
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    hits = F.array(
        F.when(F.col("event_type") == "error", F.lit("sink_errors")),
        F.when(F.col("value") >= 90, F.lit("sink_hot")),
    )
    matched = F.array_distinct(F.filter(hits, lambda x: x.isNotNull()))
    sinks = F.when(F.size(matched) > 0, matched).otherwise(
        F.array(F.lit("sink_default"))
    )
    return e.select("event_id", F.explode(sinks).alias("sink"))


# =====================================================================
# Time bucketing + percentile aggregates (SURVEY §2.2: chrono +
# hdrhistogram intent)
# =====================================================================


@register(
    "time_bucket_rollup",
    """
    WITH q AS (
      SELECT event_type,
             date_diff('second', TIMESTAMP '1970-01-01', ts) AS u,
             CAST(floor(value * 100.0) AS BIGINT) AS cents
      FROM events
    )
    SELECT '5m' AS res, event_type,
           CAST(floor(u / 300.0) AS BIGINT) * 300 AS bucket_start,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(cents) / 100.0, 2) AS sum_value,
           round(sum(cents) / (100.0 * count(*)), 4) AS avg_value
    FROM q GROUP BY event_type, bucket_start
    UNION ALL
    SELECT '1h' AS res, event_type,
           CAST(floor(u / 3600.0) AS BIGINT) * 3600 AS bucket_start,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(cents) / 100.0, 2) AS sum_value,
           round(sum(cents) / (100.0 * count(*)), 4) AS avg_value
    FROM q GROUP BY event_type, bucket_start
    UNION ALL
    SELECT '1d' AS res, event_type,
           CAST(floor(u / 86400.0) AS BIGINT) * 86400 AS bucket_start,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(cents) / 100.0, 2) AS sum_value,
           round(sum(cents) / (100.0 * count(*)), 4) AS avg_value
    FROM q GROUP BY event_type, bucket_start
    """,
)
def time_bucket_rollup(spark, sf_dir):
    """Multi-resolution rollup CASCADE (hypertable-style continuous
    aggregate): 5-minute buckets aggregate the raw events once;
    hourly merges the 5-minute partials and daily merges hourly —
    exactly, because counts and integer-quantized value sums are
    order-free mergeable longs. The oracle computes every level
    DIRECTLY from raw, so a green row proves derived-from-partials ==
    recomputed-from-scratch — the invariant that lets a 100 TB
    deployment maintain coarse rollups without rescanning the corpus."""
    from ves_spark.aggregate import rollup_cascade

    return rollup_cascade(load(spark, sf_dir, "events"))


@register(
    "percentile_by_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def percentile_by_type(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.95), 4).alias("p95"),
        F.round(F.percentile("value", 0.99), 4).alias("p99"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "hdr_percentiles_rollup",
    """
    WITH src AS (
      SELECT l_returnflag, CAST(floor(l_extendedprice) AS BIGINT) AS v FROM lineitem
    ), b AS (
      SELECT l_returnflag, v,
             CASE WHEN v <= 0 THEN 0
                  WHEN v < 128 THEN v
                  ELSE (length(printf('%b', v)) - 7) * 128
                       + (v >> (length(printf('%b', v)) - 8)) - 128
             END AS bucket
      FROM src
    ), h AS (
      SELECT l_returnflag, bucket, count(*) AS cnt, sum(v) AS sum_v
      FROM b GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, bucket, cnt, sum_v,
             sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
             sum(cnt) OVER (PARTITION BY l_returnflag) AS total
      FROM h
    ), vv AS (
      SELECT *, CASE WHEN bucket < 256 THEN bucket
                     ELSE ((bucket % 128) + 128) << ((bucket // 128) - 1)
                END AS lo
      FROM c
    )
    SELECT l_returnflag,
           CAST(sum(cnt) AS BIGINT) AS cnt,
           CAST(sum(sum_v) AS BIGINT) AS sum_v,
           CAST(min(CASE WHEN cum >= ceil(0.50 * total) THEN lo END) AS BIGINT) AS p50,
           CAST(min(CASE WHEN cum >= ceil(0.95 * total) THEN lo END) AS BIGINT) AS p95,
           CAST(min(CASE WHEN cum >= ceil(0.99 * total) THEN lo END) AS BIGINT) AS p99
    FROM vv GROUP BY l_returnflag
    """,
)
def hdr_percentiles_rollup(spark, sf_dir):
    """The streaming percentile sketch's math, driver-oracled: HDR
    log-bucket histogram (streaming/hdr.py — the same rollup the
    watermarked stream maintains incrementally) + nearest-rank bucket
    walk, replicated bit-for-bit in DuckDB (floor(log2) via binary
    string length on both engines). Bounded error by construction:
    <= 2^-7 relative; counts and sums exact."""
    from ves_spark.streaming.hdr import percentiles_from_histogram, rollup_histogram

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.floor("l_extendedprice").cast("long").alias("v")
    )
    hist = rollup_histogram(li, ["l_returnflag"], "v", p=7)
    return percentiles_from_histogram(hist, ["l_returnflag"], p=7)


# =====================================================================
# JSON parse (SURVEY §2.2: serde_json intent, Cargo.toml:37)
# =====================================================================


@register(
    "json_parse_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           count(*) AS cnt
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
    """,
)
def json_parse_props(spark, sf_dir):
    from ves_spark.operators.spread import spread

    # project to the one needed column, then spread: the JSON parse is
    # the dominant per-row cost and the single-row-group scan would
    # otherwise run it on one task (see operators/spread.py)
    e = spread(
        load(spark, sf_dir, "events").select("event_id", "props"), "event_id"
    )
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select((k % 10).alias("k_mod"))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# =====================================================================
# Regex parse (SURVEY §2.2: regex intent, Cargo.toml:39) over documents
# =====================================================================


@register(
    "regex_parse_docs",
    """
    SELECT regexp_extract(text, '^(\\w+)', 1) AS first_word,
           count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY regexp_extract(text, '^(\\w+)', 1)
    """,
)
def regex_parse_docs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"), "n_chars")
        .groupBy("first_word")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# =====================================================================
# Window functions / top-k
# =====================================================================


@register(
    "topk_rankings",
    """
    SELECT 'grp:' || o_orderpriority AS scope, o_orderkey AS key_a,
           CAST(0 AS BIGINT) AS key_b, o_totalprice AS price, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
    WHERE rnk <= 3
    UNION ALL
    SELECT 'global' AS scope, l_orderkey AS key_a,
           CAST(l_linenumber AS BIGINT) AS key_b, l_extendedprice AS price,
           CAST(row_number() OVER (ORDER BY l_extendedprice DESC,
                                   l_orderkey, l_linenumber) AS INTEGER) AS rnk
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 20) s
    """,
)
def topk_rankings(spark, sf_dir):
    """Per-group window top-k UNION ALL global sort+limit top-k with a
    ``scope`` marker — two distinct physical operators (rank-filter
    WindowExec vs TakeOrderedAndProject) kept in one registry slot so
    both stay inside the driver's 50-entry correctness window."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    wg = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    grouped = (
        o.withColumn("rnk", F.row_number().over(wg))
        .filter(F.col("rnk") <= 3)
        .select(
            F.concat(F.lit("grp:"), F.col("o_orderpriority")).alias("scope"),
            F.col("o_orderkey").alias("key_a"),
            F.lit(0).cast("long").alias("key_b"),
            F.col("o_totalprice").alias("price"),
            "rnk",
        )
    )
    # TakeOrderedAndProject does the heavy lifting; the rank window
    # then runs over just those 20 rows.
    wl = W.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
    glob = (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .withColumn("rnk", F.row_number().over(wl))
        .select(
            F.lit("global").alias("scope"),
            F.col("l_orderkey").alias("key_a"),
            F.col("l_linenumber").cast("long").alias("key_b"),
            F.col("l_extendedprice").alias("price"),
            "rnk",
        )
    )
    return grouped.unionByName(glob)


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# =====================================================================
# Set ops / distinct
# =====================================================================


@register(
    "user_set_summary",
    """
    SELECT 'setops' AS scope, user_id AS key_a,
           CAST(0 AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS n_events
    FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error' AND value > 450
    ) s
    UNION ALL
    SELECT 'dist:' || event_type AS scope, CAST(0 AS BIGINT) AS key_a,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def user_set_summary(spark, sf_dir):
    """INTERSECT/EXCEPT set ops UNION ALL per-type distinct counts
    with a ``scope`` marker — both operator families in one registry
    slot (driver caps the correctness run at 50 entries).

    Asymmetric value thresholds on the set-ops leg: every user has
    every event type in the synth data, so unfiltered
    INTERSECT/EXCEPT collapses to the empty set; these cuts leave a
    real overlap-minus-exclusion set."""
    e = load(spark, sf_dir, "events")

    def u(t, min_value=None):
        d = e.filter(F.col("event_type") == t)
        if min_value is not None:
            d = d.filter(F.col("value") > min_value)
        return d.select("user_id")

    # intersect/subtract are the DISTINCT set ops, matching SQL
    # INTERSECT / EXCEPT.
    setops = (
        u("purchase", 200)
        .intersect(u("click"))
        .subtract(u("error", 450))
        .select(
            F.lit("setops").alias("scope"),
            F.col("user_id").alias("key_a"),
            F.lit(0).cast("long").alias("n_users"),
            F.lit(0).cast("long").alias("n_events"),
        )
    )
    dist = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.concat(F.lit("dist:"), F.col("event_type")).alias("scope"),
            F.lit(0).cast("long").alias("key_a"),
            "n_users",
            "n_events",
        )
    )
    return setops.unionByName(dist)


# =====================================================================
# Grouping sets / rollup / pivot
# =====================================================================


@register(
    "rollup_cube",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def rollup_cube(spark, sf_dir):
    """Grouping-sets aggregation. CUBE's grouping-set lattice is a
    strict superset of ROLLUP's on the same keys, so one query covers
    both shapes (this absorbed the former separate ``cube_agg`` entry:
    the driver caps its correctness run at 50 registry entries, so
    redundant grouping-set coverage was folded here to keep every
    registered query driver-checked)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("sum_qty")
    )


@register(
    "pivot_event_counts",
    """
    SELECT user_id % 100 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'view') AS view,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id % 100
    """,
)
def pivot_event_counts(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("user_bucket", F.col("user_id") % 100)
        .groupBy("user_bucket")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["view", "click", "purchase", "signup", "error"])
    )


# =====================================================================
# Scalar function battery (string / math / timestamp)
# =====================================================================


@register(
    "scalar_functions",
    """
    SELECT 'scalar' AS scope, o_orderkey,
           upper(o_orderpriority) AS prio_upper,
           substr(o_orderstatus, 1, 1) AS status_c,
           length(o_orderpriority) AS prio_len,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           round(abs(o_totalprice - 100000.0), 2) AS dist_100k,
           round(sqrt(o_totalprice), 4) AS sqrt_price,
           concat(o_orderstatus, '-', o_orderpriority) AS tag
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT 'outlier' AS scope, o_orderkey,
           NULL, NULL, NULL, NULL, NULL,
           NULL, NULL,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS tag
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.2 FROM orders)
    """,
)
def scalar_functions(spark, sf_dir):
    """Two SQL-surface legs under one registry slot (driver 50-cap
    fold #7): scope='scalar' is the scalar-function projection,
    scope='outlier' the correlated-free scalar subquery (threshold
    avg*1.2 — the synth price distribution is bounded, so *2 selects
    nothing and the check would be vacuous; price rides the shared
    `tag` column as a string). The price is rendered via an explicit
    DECIMAL(18,2) cast on BOTH engines: default double->string is
    engine-defined (Java switches to scientific notation at 1e7,
    DuckDB does not), so the old round()+CAST formulation was
    data-scale-dependent."""
    o = load(spark, sf_dir, "orders")
    scalar = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.lit("scalar").alias("scope"),
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("dist_100k"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
    )
    o.createOrReplaceTempView("orders_v")
    outlier = spark.sql(
        """
        SELECT 'outlier' AS scope, o_orderkey,
               CAST(NULL AS STRING) AS prio_upper,
               CAST(NULL AS STRING) AS status_c,
               CAST(NULL AS INT) AS prio_len,
               CAST(NULL AS INT) AS yr,
               CAST(NULL AS INT) AS mo,
               CAST(NULL AS DOUBLE) AS dist_100k,
               CAST(NULL AS DOUBLE) AS sqrt_price,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS tag
        FROM orders_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.2 FROM orders_v)
        """
    )
    return scalar.unionByName(outlier)


# =====================================================================
# Training-data pipeline operators (SURVEY.md §2 extensions):
# deduplication, similarity search, text analysis. Implementations in
# ves_spark/operators/.
# =====================================================================


@register(
    "dedup_exact_docs",
    """
    SELECT text, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact_docs(spark, sf_dir):
    from ves_spark.operators.dedup import dedup_exact

    d = load(spark, sf_dir, "documents")
    return dedup_exact(d, "text", "doc_id")


@register(
    "minhash_exact_dup_pairs",
    """
    WITH planted AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM planted a JOIN planted b
      ON a.text = b.text AND a.doc_id < b.doc_id
    """,
)
def minhash_exact_dup_pairs(spark, sf_dir):
    """MinHash LSH candidates verified by text equality. Identical
    docs have identical signatures, so every identical-text pair MUST
    collide in every band — the SQL self-join on text is therefore an
    exact oracle for this query (completeness AND soundness)."""
    from ves_spark.operators.dedup import minhash_lsh_candidates

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    cands = minhash_lsh_candidates(planted, "text", "doc_id", n_hashes=32, bands=8)
    t = planted.select(F.col("doc_id").alias("_tid"), F.col("text").alias("_t"))
    return (
        cands.join(t.withColumnRenamed("_tid", "id_a").withColumnRenamed("_t", "ta"), "id_a")
        .join(t.withColumnRenamed("_tid", "id_b").withColumnRenamed("_t", "tb"), "id_b")
        .filter(F.col("ta") == F.col("tb"))
        .select("id_a", "id_b")
    )


@register(
    "ngram_jaccard_pairs",
    """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), pos AS (
      SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words WHERE len(w) >= 3
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s FROM pos
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
    FROM common
    JOIN sizes na ON common.id_a = na.doc_id
    JOIN sizes nb ON common.id_b = nb.doc_id
    WHERE c * 1.0 / (na.n + nb.n - c) >= 0.2
    """,
)
def ngram_jaccard_pairs_q(spark, sf_dir):
    from ves_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    return ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.2)


@register(
    "dedup_components",
    """
    WITH RECURSIVE words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), pos AS (
      SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words WHERE len(w) >= 3
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s FROM pos
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), edges AS (
      SELECT id_a, id_b
      FROM common JOIN sizes na ON common.id_a = na.doc_id
      JOIN sizes nb ON common.id_b = nb.doc_id
      WHERE c * 1.0 / (na.n + nb.n - c) >= 0.2
    ), sym AS (
      SELECT id_a AS s, id_b AS d FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), reach(a, b) AS (
      SELECT s, s FROM sym
      UNION
      SELECT r.a, y.d FROM reach r JOIN sym y ON r.b = y.s
    )
    SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
    """,
)
def dedup_components(spark, sf_dir):
    """Near-dup CLUSTERING: connected components over the n-gram
    Jaccard pair graph (near-dup relations chain — A~B~C needs the
    whole component to pick one keeper). Spark side is alternating
    large-star/small-star rounds (operators/components.py, O(log²)
    rounds on any graph shape); the oracle
    is the full transitive closure as a DuckDB recursive CTE — an
    iterative DataFrame algorithm proven against recursive SQL."""
    from ves_spark.operators.components import connected_components
    from ves_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.2)
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), "component"
    )


@register(
    "simhash_near_pairs",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ') AS text
      FROM documents WHERE doc_id % 10 = 0
    ),
    w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM d),
    h AS (SELECT doc_id, md5(w) AS hx FROM w),
    v AS (
      SELECT doc_id, b,
             sum(2 * (((strpos('0123456789abcdef', substr(hx, b // 4 + 1, 1)) - 1)
                       >> (b % 4)) & 1) - 1) AS votes
      FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bb
      GROUP BY doc_id, b
    ),
    s AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
      FROM v GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 8
    """,
)
def simhash_near_pairs_q(spark, sf_dir):
    """SimHash near-pairs over the cross-engine md5-hex signature
    (operators/dedup.py::simhash_md5), candidates via the
    radius-derived pigeonhole block join. The DuckDB oracle recomputes
    the signature digit-by-digit and brute-forces ALL pairs — so it
    checks both the hash and the completeness of the block-join
    candidate generation (the production SipHash kernel is covered by
    pytest planted-pair completeness instead)."""
    from ves_spark.operators.dedup import near_pairs_from_sig, simhash_md5

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text"
    )
    # plant mutated near-dups: drop the last word of every 10th doc
    mutated = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')").alias("text"),
    )
    corpus = d.unionAll(mutated)
    sigs = simhash_md5(corpus, "text", "doc_id", n_bits=60)
    # row-count hint from the column-pruned input count (NOT the
    # signature frame — counting that would run the signature twice)
    return near_pairs_from_sig(
        sigs, "_id", "sig", n_bits=60, max_hamming=8,
        n_rows_hint=corpus.count(),
    )


@register(
    "cosine_topk",
    """
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT q.q_id, c.vec_id AS c_id,
             round(
               list_sum([CAST(q.q_vec[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) FOR i IN range(1, 65)])
               / (sqrt(list_sum([CAST(q.q_vec[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE) FOR i IN range(1, 65)]))
                * sqrt(list_sum([CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) FOR i IN range(1, 65)])))
             , 6) AS cos
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.q_id
    )
    SELECT q_id, c_id, cos, rnk FROM (
      SELECT q_id, c_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
      FROM scored) t
    WHERE rnk <= 5
    """,
)
def cosine_topk_q(spark, sf_dir):
    from ves_spark.operators.similarity import cosine_topk_bruteforce

    e = load(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    # dim=64: unrolled codegen'd cosine (bit-identical to the fold)
    return cosine_topk_bruteforce(queries_df, corpus, k=5, dim=64)


def _ann_lsh_oracle_sql(n_planes: int = 3, n_tables: int = 12, dim: int = 64) -> str:
    """DuckDB replica of cosine_topk_lsh: the hyperplanes are seeded on
    the driver and inlined as literals in BOTH engines (repr round-trips
    doubles exactly), dots are double-cast sequential folds on both
    sides, so bucket assignments — and therefore the candidate sets and
    the final top-k — are bit-identical."""
    from ves_spark.operators.similarity import _planes

    tables = [_planes(dim, n_planes, 1234 + 7919 * t) for t in range(n_tables)]

    def dot(vec: str, plane: list[float]) -> str:
        lit = "[" + ",".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        return (
            f"list_sum([CAST({vec}[i] AS DOUBLE) * ({lit})[i] "
            f"FOR i IN range(1, {dim + 1})])"
        )

    def bucket(vec: str, planes: list[list[float]]) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN {dot(vec, p)} > 0 THEN {1 << b} ELSE 0 END)"
            for b, p in enumerate(planes)
        ) + ")"

    qb = "\n      UNION ALL ".join(
        f"SELECT q_id, q_vec, {t} AS tbl, {bucket('q_vec', planes)} AS bkt FROM q"
        for t, planes in enumerate(tables)
    )
    cb = "\n      UNION ALL ".join(
        f"SELECT vec_id AS c_id, embedding AS c_vec, {t} AS tbl, "
        f"{bucket('embedding', planes)} AS bkt FROM embeddings"
        for t, planes in enumerate(tables)
    )
    norm = (
        "sqrt(list_sum([CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})]))"
    )
    cos = (
        f"list_sum([CAST(q_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})]) / ({norm.format(v='q_vec')} * {norm.format(v='c_vec')})"
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
    ),
    qb AS ({qb}),
    cb AS ({cb}),
    cand AS (
      SELECT DISTINCT qb.q_id, cb.c_id, qb.q_vec, cb.c_vec
      FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bkt = qb.bkt
      WHERE qb.q_id <> cb.c_id
    ),
    scored AS (SELECT q_id, c_id, round({cos}, 6) AS cos FROM cand)
    SELECT q_id, c_id, cos, rnk FROM (
      SELECT q_id, c_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
      FROM scored) t
    WHERE rnk <= 5
    """


def _fold_cos_sql(dim: int) -> str:
    """DuckDB cosine template matching the Spark sequential-fold
    double cosine bit-for-bit; format with operands a/b."""
    return (
        "(list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})]) / "
        "(sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})])) * "
        "sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})]))))"
    )


def _kmeans_prefix_sql(
    base_select: str,
    k_cents: int,
    iters: int,
    dim: int,
    quant: int = 1 << 20,
) -> str:
    """Shared CTE chain replaying seeded Lloyd k-means
    (operators/similarity.py::train_kmeans_centroids) over ``base``
    (any (c_id, c_vec) SELECT): init = k smallest md5(id), each
    iteration one assignment (same double fold cosine, tiebreak to
    smaller cent_id) and one integer-sum centroid update — components
    scaled by 2^20 (exact exponent shift), floored to BIGINT, summed
    exactly, divided once, so no float-accumulation order anywhere
    and the replay is bit-for-bit. Ends with ``assign`` = the final
    nearest-centroid assignment of every base row against
    cents{iters}. Consumers append their own CTEs/SELECT."""
    q_dbl = float(quant)
    cos = _fold_cos_sql(dim)
    # cent_vec is already DOUBLE — the redundant CAST keeps one cosine
    # template for both raw-float and trained-centroid operands
    c_cent = cos.format(a="c_vec", b="cent_vec")
    md5_32 = duck_md5_int_sql("c_id", 8)
    sums = ",\n             ".join(
        f"sum(CAST(floor(CAST(c_vec[{d + 1}] AS DOUBLE) * {q_dbl}) AS BIGINT)) AS s{d + 1}"
        for d in range(dim)
    )
    mean_list = ", ".join(
        f"CAST(u.s{d + 1} AS DOUBLE) / ({q_dbl} * u.n)" for d in range(dim)
    )
    parts = [
        f"""
    WITH base AS (
      {base_select}
    ),
    cents0 AS (
      SELECT c_id AS cent_id,
             [CAST(c_vec[i] AS DOUBLE) FOR i IN range(1, {dim + 1})] AS cent_vec
      FROM (
        SELECT c_id, c_vec,
               row_number() OVER (ORDER BY ({md5_32}), c_id) AS rn
        FROM base) t
      WHERE rn <= {k_cents}
    )"""
    ]
    for it in range(iters):
        parts.append(f""",
    asg{it} AS (
      SELECT c_id, c_vec, cent_id FROM (
        SELECT b.c_id, b.c_vec, c.cent_id,
               row_number() OVER (
                 PARTITION BY b.c_id ORDER BY {c_cent.replace("cent_vec", "c.cent_vec")} DESC, c.cent_id) AS rn
        FROM base b CROSS JOIN cents{it} c) t
      WHERE rn = 1
    ),
    upd{it} AS (
      SELECT cent_id, count(*) AS n,
             {sums}
      FROM asg{it} GROUP BY cent_id
    ),
    cents{it + 1} AS (
      SELECT c.cent_id,
             CASE WHEN u.cent_id IS NULL THEN c.cent_vec
                  ELSE [{mean_list}] END AS cent_vec
      FROM cents{it} c LEFT JOIN upd{it} u USING (cent_id)
    )""")
    parts.append(f""",
    assign AS (
      SELECT c_id, c_vec, cent_id FROM (
        SELECT b.c_id, b.c_vec, c.cent_id,
               row_number() OVER (
                 PARTITION BY b.c_id ORDER BY {c_cent.replace("cent_vec", "c.cent_vec")} DESC, c.cent_id) AS rn
        FROM base b CROSS JOIN cents{iters} c) t
      WHERE rn = 1
    )""")
    return "".join(parts)


def _ann_ivf_oracle_sql(
    k_cents: int = 32,
    iters: int = 2,
    n_probe: int = 8,
    dim: int = 64,
    quant: int = 1 << 20,
) -> str:
    """DuckDB replica of cosine_topk_ivf INCLUDING the seeded-Lloyd
    k-means training — built on ``_kmeans_prefix_sql`` (which carries
    the bit-for-bit replay argument); this adds the query-side probe
    CTEs and the per-query top-k."""
    cos = _fold_cos_sql(dim)
    q_cent = cos.format(a="q_vec", b="cent_vec")
    q_c = cos.format(a="q_vec", b="c_vec")
    prefix = _kmeans_prefix_sql(
        "SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings",
        k_cents,
        iters,
        dim,
        quant,
    )
    return prefix + f""",
    q AS (
      SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
    ),
    probes AS (
      SELECT q_id, q_vec, cent_id FROM (
        SELECT q.q_id, q.q_vec, c.cent_id,
               row_number() OVER (
                 PARTITION BY q.q_id ORDER BY {q_cent.replace("cent_vec", "c.cent_vec")} DESC, c.cent_id) AS rn
        FROM q CROSS JOIN cents{iters} c) t
      WHERE rn <= {n_probe}
    ),
    scored AS (
      SELECT q_id, c_id, round({q_c}, 6) AS cos
      FROM probes JOIN assign USING (cent_id)
      WHERE q_id <> c_id
    )
    SELECT q_id, c_id, cos, rnk FROM (
      SELECT q_id, c_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
      FROM scored) t
    WHERE rnk <= 5
    """


def _semantic_dedup_oracle_sql(
    threshold: float = 0.9,
    k_cents: int = 32,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB replica of operators/similarity.py::semantic_dedup over
    a planted corpus: every 5th embedding gets a near-copy (id + 1e6,
    last component zeroed, cosine ~0.999 — the synth embeddings have
    no natural near-dups, max pairwise cosine ~0.51). The k-means
    training replays bit-for-bit via ``_kmeans_prefix_sql``; the drop
    rule (exists a same-cluster SMALLER-id partner with cosine >=
    threshold) is an anti-join against the within-cluster self-join's
    higher-id side."""
    cos = _fold_cos_sql(dim)
    pair_cos = cos.format(a="a.c_vec", b="b.c_vec")
    prefix = _kmeans_prefix_sql(
        f"""SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS c_id,
             embedding[1:{dim - 1}] || [CAST(0.0 AS FLOAT)] AS c_vec
      FROM embeddings WHERE vec_id % 5 = 0""",
        k_cents,
        iters,
        dim,
    )
    return prefix + f""",
    dropped AS (
      SELECT DISTINCT b.c_id
      FROM assign a JOIN assign b
        ON a.cent_id = b.cent_id AND a.c_id < b.c_id
      WHERE {pair_cos} >= {threshold}
    )
    SELECT a.c_id, a.cent_id FROM assign a
    LEFT JOIN dropped d USING (c_id)
    WHERE d.c_id IS NULL
    """


@register("semantic_dedup_docs", _semantic_dedup_oracle_sql())
def semantic_dedup_docs(spark, sf_dir):
    """SemDeDup semantic deduplication (cluster-then-prune) with the
    k-means training INSIDE the checked surface — the oracle replays
    init, every Lloyd iteration, the final assignment, and the
    within-cluster drop rule. Planted near-copies (every 5th vector,
    id + 1e6) are what gets pruned; all originals survive."""
    from ves_spark.operators.similarity import semantic_dedup

    e = load(spark, sf_dir, "embeddings")
    base = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    mutated = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("c_id"),
        F.concat(
            F.slice(F.col("embedding"), 1, 63),
            F.array(F.lit(0.0).cast("float")),
        ).alias("c_vec"),
    )
    return semantic_dedup(
        base.unionAll(mutated), threshold=0.9, n_cents=32, train_iters=2, dim=64
    )


def _embed_near_dup_oracle_sql(
    threshold: float = 0.9, n_planes: int = 16, n_tables: int = 4, dim: int = 64
) -> str:
    """DuckDB replica of cosine_near_dup_pairs over a planted corpus:
    the synth embeddings have no natural near-dups (max pairwise
    cosine 0.51), so the query unions each vector with a copy (id +
    1e6) whose LAST component is zeroed — cosine ~0.999, a planted
    near-dup both engines construct identically. The LSH candidate
    generation (same plane literals, same sequential-fold dots) and
    the exact cosine filter then replay bit-for-bit."""
    from ves_spark.operators.similarity import _planes

    tables = [_planes(dim, n_planes, 1234 + 7919 * t) for t in range(n_tables)]

    def dot(vec: str, plane: list[float]) -> str:
        lit = "[" + ",".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        return (
            f"list_sum([CAST({vec}[i] AS DOUBLE) * ({lit})[i] "
            f"FOR i IN range(1, {dim + 1})])"
        )

    def bucket(vec: str, planes: list[list[float]]) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN {dot(vec, p)} > 0 THEN {1 << b} ELSE 0 END)"
            for b, p in enumerate(planes)
        ) + ")"

    cb = "\n      UNION ALL ".join(
        f"SELECT c_id, c_vec, {t} AS tbl, {bucket('c_vec', planes)} AS bkt "
        "FROM corpus"
        for t, planes in enumerate(tables)
    )
    norm = (
        "sqrt(list_sum([CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})]))"
    )
    cos = (
        f"list_sum([CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})]) / ({norm.format(v='va')} * {norm.format(v='vb')})"
    )
    return f"""
    WITH corpus AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS c_id,
             embedding[1:{dim - 1}] || [CAST(0.0 AS FLOAT)] AS c_vec
      FROM embeddings
    ),
    cb AS ({cb}),
    cand AS (
      SELECT DISTINCT a.c_id AS id_a, b.c_id AS id_b, a.c_vec AS va, b.c_vec AS vb
      FROM cb a JOIN cb b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.c_id < b.c_id
    )
    SELECT id_a, id_b, cos FROM (
      SELECT id_a, id_b, round({cos}, 6) AS cos FROM cand) t
    WHERE cos >= {threshold}
    """


@register("embedding_near_dup_pairs", _embed_near_dup_oracle_sql())
def embedding_near_dup_pairs_q(spark, sf_dir):
    from ves_spark.operators.similarity import cosine_near_dup_pairs

    e = load(spark, sf_dir, "embeddings")
    base = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    mutated = e.select(
        (F.col("vec_id") + 1_000_000).alias("c_id"),
        F.concat(
            F.slice(F.col("embedding"), 1, 63),
            F.array(F.lit(0.0).cast("float")),
        ).alias("c_vec"),
    )
    # 16 planes/table: on diffuse vectors, 4-bit buckets admit ~22%
    # of ALL pairs as candidates (measured 34 s at sf0.1); 16-bit cuts
    # random-pair collisions to ~1.5e-5 while a cos~0.999 near-dup
    # still collides in >=1 of 4 tables w.p. ~0.998.
    return cosine_near_dup_pairs(
        base.unionAll(mutated), threshold=0.9, n_planes=16, n_tables=4, dim=64
    )


@register("ann_ivf_topk", _ann_ivf_oracle_sql())
def ann_ivf_topk_q(spark, sf_dir):
    """IVF ANN with centroids trained by seeded Lloyd k-means (2
    iterations, 32 cells) — the oracle SQL replays init, assignments
    and the integer-sum centroid updates bit-for-bit, so this checks
    the TRAINING, not just the probe join."""
    from ves_spark.operators.similarity import cosine_topk_ivf

    e = load(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return cosine_topk_ivf(
        queries_df, corpus, k=5, n_cents=32, train_iters=2, n_probe=8
    )


@register("ann_lsh_topk", _ann_lsh_oracle_sql())
def ann_lsh_topk_q(spark, sf_dir):
    from ves_spark.operators.similarity import cosine_topk_lsh

    e = load(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return cosine_topk_lsh(
        queries_df,
        corpus,
        k=5,
        n_planes=3,
        n_tables=12,
        dim=64,
        # codegen'd bucket assignment, proven bit-identical to the fold
        # spec (and to this DuckDB oracle); 'matmul' is the Arrow path
        bucket_impl="exploded",
    )


@register(
    "token_count_docs",
    """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), pos AS (
      SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words
    ), g AS (
      SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s FROM pos
    ), c AS (
      SELECT doc_id, count(*) AS n_ngrams, count(DISTINCT s) AS n_distinct
      FROM g GROUP BY doc_id
    )
    SELECT d.doc_id,
           len(string_split_regex(trim(d.text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split_regex(trim(d.text), '\\s+'),
                              w -> (length(w) * 131 + ascii(w)) % 1000000007)),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp,
           coalesce(c.n_ngrams, 0) AS n_ngrams,
           coalesce(c.n_distinct, 0) AS n_distinct,
           round(CASE WHEN coalesce(c.n_ngrams, 0) > 0
                 THEN 1 - c.n_distinct * 1.0 / c.n_ngrams ELSE 0 END, 4) AS rep_ratio
    FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
    """,
)
def token_count_docs(spark, sf_dir):
    """Token counting, the rolling-hash document fingerprint, AND the
    Gopher-style repeated-trigram ratio in one driver check (registry
    folds #6 and #8 — all are map-only per-doc text projections riding
    the same scan; every column keeps its operator: ws/bpe_tokens from
    token counting, fp from fingerprinting, n_ngrams/n_distinct/
    rep_ratio from operators/text.py::repetition_features). The fp
    word hash ((len*131 + ascii(first)) mod M) is the cross-engine
    variant; production (operators/text.py) uses xxhash64 words."""
    from ves_spark.operators.spread import spread
    from ves_spark.operators.text import (
        bpe_token_count,
        repetition_features,
        ws_token_count,
    )

    # map-heavy per-doc projections over a file-limited scan: one
    # narrow keyed shuffle unlocks the cores (see operators/spread.py)
    d = spread(load(spark, sf_dir, "documents"), "doc_id")
    words = F.split(F.trim(F.col("text")), r"\s+")
    vals = F.transform(
        words, lambda w: (F.length(w) * 131 + F.ascii(w)) % 1000000007
    )
    fp = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return repetition_features(d, "text", n=3).select(
        "doc_id",
        ws_token_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        fp.alias("fp"),
        "n_ngrams",
        "n_distinct",
        "rep_ratio",
    )


@register(
    "psi_drift_docs",
    """
    WITH b AS (
      SELECT 'lang' AS feature, coalesce(lang, '__null__') AS bucket,
             doc_id % 4 = 0 AS is_cur FROM documents
      UNION ALL
      SELECT 'source', coalesce(source, '__null__'), doc_id % 4 = 0 FROM documents
      UNION ALL
      SELECT 'n_chars',
             CAST(CASE WHEN n_chars <= 150 THEN 0 WHEN n_chars <= 250 THEN 1
                       WHEN n_chars <= 350 THEN 2 WHEN n_chars <= 450 THEN 3
                       ELSE 4 END AS VARCHAR),
             doc_id % 4 = 0 FROM documents
    ), h AS (
      SELECT feature, bucket,
             CAST(sum(CASE WHEN is_cur THEN 0 ELSE 1 END) AS BIGINT) AS cp,
             CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT) AS cq
      FROM b GROUP BY feature, bucket
    ), t AS (
      SELECT feature,
             greatest(cp * 1.0 / sum(cp) OVER (PARTITION BY feature), 1e-6) AS p,
             greatest(cq * 1.0 / sum(cq) OVER (PARTITION BY feature), 1e-6) AS q
      FROM h
    )
    SELECT feature, round(sum((p - q) * ln(p / q)), 6) AS psi
    FROM t GROUP BY feature
    """,
)
def psi_drift_docs(spark, sf_dir):
    """Corpus-drift PSI per feature (operators/drift.py::psi_table —
    the DataFrame sibling of population_stability, registered per
    round-5 ask #6). Epoch split is deterministic (doc_id % 4: three
    quarters reference, one quarter monitored); numeric n_chars uses
    explicit literal edges so both engines bucketize identically.
    Reference basis: the per-source marginals the reference exports
    across snapshots (src/tailer/manager.rs:21-29) compared between
    epochs. Scale: map-only bucketize legs ride the scan; everything
    after the first groupBy is bins-sized."""
    from ves_spark.operators.drift import psi_table

    d = load(spark, sf_dir, "documents")
    n_chars = F.col("n_chars")
    bucket = (
        F.when(n_chars <= 150, 0)
        .when(n_chars <= 250, 1)
        .when(n_chars <= 350, 2)
        .when(n_chars <= 450, 3)
        .otherwise(4)
    )
    return psi_table(
        d,
        F.col("doc_id") % 4 == 0,
        {
            "lang": F.col("lang"),
            "source": F.col("source"),
            "n_chars": bucket,
        },
    )


@register(
    "decontaminate_docs",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), pos AS (
      SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM w
    ), g AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s FROM pos
    ), bench AS (
      SELECT DISTINCT doc_id AS bench_id, s FROM g WHERE doc_id % 29 = 0
    ), corpus AS (
      SELECT doc_id, s FROM g WHERE doc_id % 29 <> 0
    )
    SELECT c.doc_id,
           count(DISTINCT c.s) AS n_hit_ngrams,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id
    """,
)
def decontaminate_docs(spark, sf_dir):
    """Benchmark decontamination (train-test leakage): corpus docs
    sharing any 5-word-gram with a synthetic benchmark slice
    (doc_id % 29 = 0). The benchmark n-gram set is BROADCAST (eval
    sets are MBs) — the 100 TB corpus side is a map-side probe on the
    8-byte xxhash64 of the gram, no big-side shuffle."""
    from ves_spark.operators.text import contaminated_docs

    d = load(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 29 != 0)
    bench = d.filter(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contaminated_docs(corpus, bench, "text", "doc_id", "bench_id", n=5)


@register(
    "dup_span_coverage_docs",
    """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), toks AS (
      SELECT doc_id, w, len(w) AS n_tok FROM words
    ), pos AS (
      SELECT doc_id, unnest(range(0, n_tok - 4)) AS p, w
      FROM toks WHERE n_tok >= 5
    ), grams AS (
      SELECT doc_id, p, md5(array_to_string(w[p+1:p+5], chr(31))) AS g FROM pos
    ), dup AS (
      SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
    ), hits AS (
      SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM dup)
    ), marked AS (
      SELECT doc_id, p,
             CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                    OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 5
                  THEN 1 ELSE 0 END AS ni
      FROM hits
    ), isl AS (
      SELECT doc_id, p,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), spans AS (
      SELECT doc_id, island, max(p) - min(p) + 5 AS span_tok
      FROM isl GROUP BY doc_id, island
    ), per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(span_tok) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(t.n_tok AS BIGINT) AS n_tok, p.n_spans, p.dup_tokens,
           round(p.dup_tokens * 1.0 / t.n_tok, 4) AS dup_frac
    FROM per_doc p JOIN toks t USING (doc_id)
    """,
)
def dup_span_coverage_docs(spark, sf_dir):
    """Exact-substring dedup (Lee et al. 2021 ExactSubstr): per-doc
    coverage by k-token spans duplicated corpus-wide, windowed-hash
    plan instead of a single-node suffix array. ``hash_mode='md5'``
    here so the DuckDB oracle replays the gram keys byte-for-byte;
    the scale default is xxhash64 over the token slice (no string
    materialization), proven span-identical in tests. Extends the
    reference's whole-unit content identity (discovery.rs:33-35)
    below unit granularity."""
    from ves_spark.operators.token_dedup import duplicate_span_coverage

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("tokens"))
    return duplicate_span_coverage(toks, k=5, min_count=2, hash_mode="md5")


@register(
    "lm_fluency_docs",
    """
    WITH bg AS (
      SELECT doc_id, substr(text, i, 2) AS bg
      FROM (SELECT doc_id, text, unnest(generate_series(1, len(text) - 1)) AS i
            FROM documents WHERE len(text) >= 2) t
    ), model AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY bg
    ), prefix AS (
      SELECT substr(bg, 1, 1) AS pc, CAST(sum(c_bg) AS BIGINT) AS c_pre
      FROM model GROUP BY substr(bg, 1, 1)
    ), mq AS (
      SELECT m.bg,
             CAST(floor((m.c_bg + CAST(1 AS DOUBLE)) / (p.c_pre + 96.0)
                        * 1073741824.0) AS BIGINT) AS q
      FROM model m JOIN prefix p ON substr(m.bg, 1, 1) = p.pc
    )
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(q) AS BIGINT) / (count(*) * 1073741824.0), 6)
             AS lm_score
    FROM bg b JOIN mq USING (bg)
    GROUP BY b.doc_id
    """,
)
def lm_fluency_docs(spark, sf_dir):
    """Character-bigram LM fluency filter (CCNet-style quality cut),
    self-trained on the corpus. Every float step is one correctly-
    rounded IEEE-754 op (no ln(), whose last ulp varies across libm
    builds), with probabilities floor-quantized to longs so the
    per-doc mean is an order-independent integer sum — the DuckDB
    oracle replays the model AND the scores bit-for-bit."""
    from ves_spark.operators.text import lm_fluency

    return lm_fluency(load(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "pack_chunks_docs",
    """
    WITH sized AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_size
      FROM documents
    ), pre AS (
      SELECT doc_id, source, n_size,
             CAST(coalesce(sum(n_size) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_start
      FROM sized
    )
    SELECT doc_id, source, n_size, tok_start,
           CAST(floor(tok_start / 256.0) AS BIGINT) AS chunk_start,
           CAST(floor((tok_start + greatest(n_size, 1) - 1) / 256.0) AS BIGINT)
             AS chunk_end,
           CAST(tok_start % 256 AS BIGINT) AS start_off,
           CAST(floor(tok_start / 4096.0) AS BIGINT) AS shard
    FROM pre
    """,
)
def pack_chunks_docs(spark, sf_dir):
    """Sequence packing for pretraining (GPT-style concat-and-chunk):
    deterministic per-stream layout of docs into capacity-256 chunks,
    docs spanning boundaries, via the SCALABLE decomposed prefix scan
    (range-sort → per-block windows → broadcast block offsets) plus
    size-aware shard keys: shard = floor(tok_start/4096) caps every
    (source, shard) stream at the token budget no matter how skewed
    the source mix is. The oracle is the sequential window definition
    — passing proves the decomposed scan reproduces it exactly."""
    from ves_spark.operators.packing import pack_chunks_sharded
    from ves_spark.operators.text import ws_token_count

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return pack_chunks_sharded(
        d, 256, ws_token_count(F.col("text")), 4096, "source", "doc_id"
    ).select(
        "doc_id", "source", "n_size", "tok_start",
        "chunk_start", "chunk_end", "start_off", "shard",
    )


# Trained-classifier leg of quality_scores_docs: features (all in
# [0,1], parity already proven by this query's own green history) and
# the 0/1 label, as IDENTICAL SQL text on both sides so the literal-
# weight fold evaluates in the same written order.
_CLF_FEATS = [
    "least(n_words / 100.0, 1.0)",
    "stop_ratio",
    "punct_ratio",
    "ascii_ratio",
]
_CLF_LABEL = "CAST(lang = 'en' AS INT)"
_CLF_ITERS, _CLF_LR = 2, 1.0


def _quality_clf_oracle_sql() -> str:
    """DuckDB replica of quality_features + langid_scores PLUS the
    trained linear classifier (operators/classifier.py): the training
    loop is unrolled into chained CTEs — quantized integer gradient
    sums and the weight recurrence replayed bit-for-bit — and scoring
    cross-joins the final single-row weight CTE. A green row proves
    the ENTIRE model training is engine-independent."""
    from ves_spark.operators.classifier import (
        classifier_score_sql,
        classifier_training_cte_sql,
    )

    ctes, w_cte = classifier_training_cte_sql(
        "g", _CLF_FEATS, _CLF_LABEL, iters=_CLF_ITERS, lr=_CLF_LR
    )
    score = classifier_score_sql(w_cte, _CLF_FEATS, len(_CLF_FEATS))
    return f"""
    WITH f AS (
      SELECT doc_id, lang,
             string_split_regex(trim(text), '\\s+') AS words,
             string_split_regex(lower(trim(text)), '\\s+') AS lwords,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS np,
             length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) * 1.0
               / greatest(length(text), 1) AS ascii_ratio
      FROM documents
    ), g AS (
      SELECT doc_id, lang,
             len(words) AS n_words,
             round(len(list_filter(words, w -> list_contains(
               ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'],
               lower(w)))) * 1.0 / greatest(len(words), 1), 4) AS stop_ratio,
             round(np * 1.0 / greatest(nc, 1), 4) AS punct_ratio,
             round(len(list_filter(lwords, w -> list_contains(
               ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'],
               w))) * 1.0 / greatest(len(lwords), 1), 4) AS en_score,
             round(ascii_ratio, 4) AS ascii_ratio
      FROM f
    ), {ctes}
    SELECT doc_id, lang, n_words, stop_ratio, punct_ratio,
           round(least(n_words / 100.0, 1.0) * 0.4
                 + least(stop_ratio * 5, 1.0) * 0.4
                 + (1 - least(punct_ratio * 10, 1.0)) * 0.2, 4) AS quality_score,
           en_score, ascii_ratio,
           {score} AS clf_prob
    FROM g CROSS JOIN {w_cte}
    """


@register("quality_scores_docs", _quality_clf_oracle_sql())
def quality_scores_docs(spark, sf_dir):
    """Quality scoring, the langid heuristic, AND the corpus-trained
    linear classifier in one driver check (merged to keep the registry
    within the driver's 50-query cap; every operator keeps its own
    columns — quality_score from ``quality_features``, en_score/
    ascii_ratio from ``langid_scores``, clf_prob from the trained
    model). The heuristics are map-only JVM expressions riding the
    scan; training (operators/classifier.py) adds ``iters`` one-scan
    integer-sum aggregates — k+2 longs to the driver per pass — and
    scoring is again map-only. The oracle replays the full training
    (unrolled CTEs), so a green row certifies cross-engine
    reproducible model fitting, not just scoring."""
    from ves_spark.operators.classifier import (
        score_linear,
        train_linear_classifier,
    )
    from ves_spark.operators.text import langid_scores, quality_features

    from ves_spark.operators.spread import spread

    d = spread(load(spark, sf_dir, "documents"), "doc_id")
    # Feature extraction (regex/split-heavy) is consumed by every
    # training iteration AND the final scoring pass — materialize the
    # pruned feature frame once (localCheckpoint) so the text parsing
    # runs a single time instead of iters+1 times. Projected to the
    # needed columns first so the checkpoint holds features, not text.
    scored = (
        langid_scores(quality_features(d, "text"), "text")
        .select(
            "doc_id", "lang", "n_words", "stop_ratio", "punct_ratio",
            "quality_score", "en_score", "ascii_ratio",
        )
        .localCheckpoint(eager=True)
    )
    w = train_linear_classifier(
        scored, _CLF_FEATS, _CLF_LABEL, iters=_CLF_ITERS, lr=_CLF_LR
    )
    return score_linear(scored, _CLF_FEATS, w).select(
        "doc_id", "lang", "n_words", "stop_ratio", "punct_ratio",
        "quality_score", "en_score", "ascii_ratio", "clf_prob",
    )


def _pii_oracle_sql() -> str:
    """DuckDB replica of operators/text.py::pii_features over docs
    with deterministically planted PII (every 7th doc gets an email,
    an IPv4 and a phone appended — both engines construct the planted
    text identically). Patterns are shared constants restricted to
    Java-regex/RE2-common syntax; each stage counts on the previous
    stage's redacted text, exactly like the operator."""
    from ves_spark.operators.text import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

    return f"""
    WITH p AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com from 10.0.0.'
                       || CAST(doc_id % 200 AS VARCHAR) || ' tel 555-123-4567'
                  ELSE text END AS t
      FROM documents
    ), r AS (
      SELECT doc_id, t,
             regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM p
    ), r2 AS (
      SELECT doc_id, t, t1,
             regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') AS t2
      FROM r
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t1, '{PII_IPV4_RE}')) AS n_ipv4,
           len(regexp_extract_all(t2, '{PII_PHONE_RE}')) AS n_phones,
           regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM r2
    """


@register("pii_redact_docs", _pii_oracle_sql())
def pii_redact_docs(spark, sf_dir):
    """PII scrubbing (emails / IPv4 / phones → typed placeholders)
    with per-doc detection counts — the redaction stage of a
    training-data pipeline, checked down to the exact redacted string.
    Map-only codegen'd regexps; zero shuffle at any scale."""
    from ves_spark.operators.spread import spread
    from ves_spark.operators.text import pii_features

    # 4 regex passes per doc on a file-limited scan: spread first
    d = spread(load(spark, sf_dir, "documents"), "doc_id")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(" tel 555-123-4567"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pii_features(planted, "text").select(
        "doc_id", "n_emails", "n_ipv4", "n_phones", "redacted"
    )


def _kmv_oracle_sql() -> str:
    """DuckDB replay of the whole KMV path: same 60-bit md5 hash, same
    global distinct, same bottom-k, same (k-1)/u_k branch arithmetic —
    a green row proves the sketch AND the estimator are
    engine-independent (what no HLL-based approx count can offer)."""
    from ves_spark.operators.sketches import (
        kmv_estimate_sql,
        md5_hash60_sql,
    )

    kth_sql, est_sql = kmv_estimate_sql(_KMV_K)
    return f"""
    WITH h AS (
      SELECT DISTINCT lang, {md5_hash60_sql("doc_id")} AS hx FROM documents
    ),
    r AS (
      SELECT lang, hx,
             row_number() OVER (PARTITION BY lang ORDER BY hx) AS rn
      FROM h
    ),
    s AS (
      SELECT lang, list_sort(list(hx)) AS mins
      FROM r WHERE rn <= {_KMV_K} GROUP BY lang
    ),
    e AS (
      SELECT lang, {kth_sql}, {est_sql},
             (SELECT COUNT(DISTINCT d.doc_id) FROM documents d
              WHERE d.lang = s.lang) AS exact_distinct
      FROM s
    )
    SELECT lang, kth, est_distinct, exact_distinct FROM e
    """


_KMV_K = 32


@register("distinct_kmv_docs", _kmv_oracle_sql())
def distinct_kmv_docs(spark, sf_dir):
    """Per-lang distinct-doc estimate from a MERGEABLE KMV sketch
    (operators/sketches.py) next to the exact count. Driver-checked
    with the injectable cross-engine md5 hash; production uses
    xxhash64. At sf>=0.01 groups exceed k=32 distinct keys so the
    (k-1)/u_k estimator branch runs; below, the sketch is exact —
    both branches replayed by the oracle."""
    from ves_spark.operators.sketches import (
        kmv_estimate_cols,
        kmv_sketch,
        md5_hash60,
    )

    d = load(spark, sf_dir, "documents")
    sk = kmv_sketch(
        d, "doc_id", ["lang"], k=_KMV_K, hash_col=md5_hash60(F.col("doc_id"))
    )
    exact = d.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("exact_distinct")
    )
    return (
        sk.select("lang", *kmv_estimate_cols(_KMV_K))
        .join(exact, "lang")
        .select("lang", "kth", "est_distinct", "exact_distinct")
    )


@register(
    "multimodal_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum([
             (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)) - 1)
             FOR i IN range(1, octet_length(encode(text)) + 1)]) % 1000000007
           AS BIGINT) AS checksum
    FROM documents
    """,
)
def multimodal_features_q(spark, sf_dir):
    """Binary-column plumbing: documents text encoded to binary stands
    in for media payloads; deterministic fake 'decode' extracts byte
    histogram features map-side (no codec libs in this container).
    Oracle: DuckDB recomputes n_bytes (octet_length of the utf-8
    encoding) and the byte-sum checksum from hex(encode(text))."""
    from ves_spark.operators.multimodal import extract_features
    from ves_spark.operators.spread import spread

    d = spread(load(spark, sf_dir, "documents"), "doc_id")
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = extract_features(media, decode_mode="fake")
    return feats.select("media_id", "kind", "n_bytes", "checksum")


# =====================================================================
# Second operator batch: as-of join, sessionization, SQL front-end
# subqueries, salted skew aggregation, CDC-style latest-row dedup.
# =====================================================================


@register(
    "asof_join_last_order",
    """
    SELECT event_id, last_orderkey,
           strftime(last_orderdate, '%Y-%m-%d %H:%M:%S') AS last_orderdate
    FROM (
      SELECT e.event_id, o.o_orderkey AS last_orderkey,
             o.o_orderdate AS last_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) t WHERE rn = 1
    """,
)
def asof_join_last_order(spark, sf_dir):
    """As-of join (Spark lacks a native one): latest order per event at
    or before the event timestamp — equi-join on the key + range
    predicate + per-event top-1.

    The top-1 is a ``max(struct(o_orderdate, o_orderkey))`` aggregate,
    not a window: struct max is the lexicographic (date, key) maximum
    = exactly the ``ORDER BY o_orderdate DESC, o_orderkey DESC``
    row_number()=1 row (o_orderkey is unique, so no ties), and the
    aggregate partial-combines map-side — the join output never
    re-shuffles whole rows by event_id, only one partial max per
    (task, event) (guide §2.3 "aggregate before you shuffle")."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    # semi-join pre-filter (guide §3.2): the event user domain is a
    # tiny fraction of the order custkey domain, so dropping
    # non-matching orders map-side (broadcast of the distinct users)
    # keeps ~90% of the orders table out of the union shuffle; those
    # rows could never be any event's match anyway — result unchanged.
    o = o.join(
        F.broadcast(e.select("user_id").distinct()),
        o.o_custkey == F.col("user_id"),
        "left_semi",
    )
    # union + running-max instead of the join + re-aggregate: the
    # equi-join fanned out ~50 events x ~100 orders per user (measured
    # ~50M rows at sf1.0) only for the per-event aggregate to keep the
    # (date, key)-max row. Sorting each user's orders AND events on
    # one timeline and taking the RUNNING max(struct(date, key)) gives
    # each event the max over exactly the same set — its user's orders
    # with o_orderdate <= ts (orders sort before events at equal
    # timestamps: _k 0 < 1, the join's <= inclusivity) — in one
    # shuffle + one linear window pass, O(events + orders) not
    # O(events x orders). Event rows carry a NULL order struct, which
    # max() skips; events with no prior order get NULL = the rows the
    # inner join dropped.
    os_type = "struct<o_orderdate:timestamp,o_orderkey:bigint>"
    e2 = e.select(
        F.col("user_id").alias("_u"),
        F.col("ts").alias("_t"),
        F.lit(1).alias("_k"),
        "event_id",
        F.lit(None).cast(os_type).alias("_os"),
    )
    o2 = o.select(
        F.col("o_custkey").alias("_u"),
        F.col("o_orderdate").alias("_t"),
        F.lit(0).alias("_k"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct("o_orderdate", "o_orderkey").alias("_os"),
    )
    w = (
        W.partitionBy("_u")
        .orderBy("_t", "_k")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        e2.unionByName(o2)
        .withColumn("_m", F.max("_os").over(w))
        .filter((F.col("_k") == 1) & F.col("_m").isNotNull())
        .select(
            "event_id",
            F.col("_m.o_orderkey").alias("last_orderkey"),
            F.date_format("_m.o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "last_orderdate"
            ),
        )
    )


@register(
    "range_join_ship_orders",
    """
    WITH o AS (
      SELECT o_orderkey,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS DOUBLE) AS s
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ), l AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                  AS DOUBLE) AS p,
             l_quantity
      FROM lineitem
    )
    SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM o JOIN l ON l.p >= o.s AND l.p < o.s + 2
    GROUP BY o.o_orderkey
    """,
)
def range_join_ship_orders(spark, sf_dir):
    """Range (interval) join, the companion custom join to the as-of
    join above: lineitems whose ship day falls in each urgent order's
    half-open 2-day window ``[o_orderdate, o_orderdate + 2d)`` — NO
    key equi-condition exists, so naive Spark plans a
    BroadcastNestedLoopJoin / cartesian. ``bucketed_range_join``
    turns it into a hash equi-join on quantized day buckets with an
    exact post-filter (plan-asserted nested-loop-free in
    tests/test_round5_ops.py). Day arithmetic is integer datediff on
    both engines, so the oracle replays exactly.

    Plan shape (guide §2.3 "aggregate before you shuffle"): lineitem
    is pre-aggregated to per-DAY partials (count, sum) before the
    range join — the ship-day domain is thousands of values, so the
    join touches day-rows instead of 6M+ line rows and the per-order
    aggregate merges at most ceil(window/1day)+1 partials. Exact:
    counts are longs, and l_quantity is integer-valued (TPC-H
    quantities), so the regrouped double sums are order-independent
    integer arithmetic — bit-identical to summing raw rows."""
    from ves_spark.operators.joins import bucketed_range_join

    epoch = F.lit("1970-01-01").cast("date")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate").cast("date"), epoch)
            .cast("double")
            .alias("s"),
        )
        .withColumn("e", F.col("s") + F.lit(2.0))
    )
    l_day = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.datediff(F.col("l_shipdate").cast("date"), epoch)
            .cast("double")
            .alias("p"),
            "l_quantity",
        )
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("_day_cnt"),
            F.sum("l_quantity").alias("_day_qty"),
        )
    )
    joined = bucketed_range_join(l_day, o, "p", "s", "e", bucket_width=2.0)
    return joined.groupBy("o_orderkey").agg(
        F.sum("_day_cnt").alias("n_shipped"),
        F.round(F.sum("_day_qty"), 2).alias("sum_qty"),
    )


@register(
    "sessionization",
    """
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), brk AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS is_new
      FROM lagged
    ), sess AS (
      SELECT user_id, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM brk
    )
    SELECT user_id, count(DISTINCT sess_id) AS n_sessions, count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def sessionization(spark, sf_dir):
    """Gap-based sessionization (30-min gap): lag + cumulative-sum of
    session breaks — the batch equivalent of session_window."""
    e = load(spark, sf_dir, "events")
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.withColumn("prev_ts", F.lag("ts").over(w_order))
    brk = lagged.withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 1800 SECOND")),
            1,
        ).otherwise(0),
    )
    sess = brk.withColumn(
        "sess_id",
        F.sum("is_new").over(w_order.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("sess_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "sessionization_stream",
    """
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), brk AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS is_new
      FROM lagged
    ), sess AS (
      SELECT user_id, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM brk
    )
    SELECT user_id, count(DISTINCT sess_id) AS n_sessions, count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def sessionization_stream(spark, sf_dir):
    """STREAMING gap sessionization proven equal to the batch SQL: the
    custom stateful operator (applyInPandasWithState,
    streaming/stateful.py) run over the events table as a file
    stream, with a far-future sentinel event appended so the
    event-time watermark passes every real session's last+gap — every
    session therefore closes and is emitted exactly once, and the
    per-user (n_sessions, n_events) rollup must equal the batch
    lag/cumsum sessionization oracle. Cross-paradigm equivalence in
    the driver harness itself: same gap (30 min), same strict->
    boundary, append-mode exactly-once."""
    import hashlib
    import os
    import shutil
    import tempfile
    from datetime import timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ves_spark.streaming.stateful import stream_sessionize

    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    # stable base + pid: concurrent drivers on the same sf_dir must
    # not rmtree each other's stream checkpoint mid-query
    root = (
        f"{tempfile.gettempdir()}/ves_sess_stream_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    # the source write and the first micro-batch read both parallelize
    # over the data file count (coalesce(1) wrote 1M rows on one task
    # and read them back on one task); n_files + maxFilesPerTrigger
    # below keep the SAME two-batch structure — every data file lands
    # in batch 1 (the sentinel's mtime is later), the sentinel alone
    # in batch 2, and the watermark/timeout flush is batch-boundary
    # independent anyway (see the sentinel note)
    n_files = max(1, spark.sparkContext.defaultParallelism // 4)
    ev.repartition(n_files).write.parquet(src)
    # sentinel AFTER the data (later mtime): one far-future event for
    # a user id outside the real domain advances the watermark past
    # every last+gap once processed; even if a trigger takes both
    # files, the post-batch watermark + timeout trigger still flushes
    # every session — emission is deterministic either way
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([-1], pa.int64()),
                "ts": pa.array(
                    [max_ts + timedelta(days=365)], pa.timestamp("us")
                ),
            }
        ),
        f"{src}/zz-sentinel.parquet",
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", n_files)
        .parquet(src)
    )
    name = f"sess_stream_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    q = (
        stream_sessionize(stream, gap_minutes=30, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{root}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # the memory sink holds the rows in-process: the parquet source
    # and checkpoint are dead weight once the query stops, and the
    # pid-suffixed root would otherwise accumulate across driver
    # processes on a shared bench box
    shutil.rmtree(root, ignore_errors=True)
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)  # drop the sentinel user
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


@register(
    "merge_upsert_events",
    """
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           event_type, round(value, 4) AS value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def merge_upsert_events(spark, sf_dir):
    """Write-side MERGE (reference checkpoint upsert,
    src/watcher/watcher.rs:35-89): apply the events table as TWO
    successive update batches (even then odd event_ids) to an
    upsert-maintained table keyed by user_id, then read the final
    state back. The oracle is the pure latest-row-per-key over the
    union — equality proves the partition-scoped emulated MERGE
    composes correctly across batches."""
    import os
    import shutil
    import tempfile

    from ves_spark.operators.upsert import merge_upsert, read_table
    from ves_spark.sources.catalog import ParquetCatalog

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    # stable md5 base per sf_dir (reruns in one process reuse and
    # clean the same dir — no per-run leak like salted hash()) PLUS
    # the pid, so two concurrent drivers benching the same sf_dir
    # cannot rmtree each other's live catalog mid-query.
    import hashlib

    root = (
        f"{tempfile.gettempdir()}/ves_upsert_q_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    cat = ParquetCatalog(root)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for batch in (
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    ):
        merge_upsert(
            spark, cat, "state", batch, ["user_id"], "ts", tiebreak=["event_id"]
        )
    st = read_table(spark, cat, "state")
    return st.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
        F.round("value", 4).alias("value"),
    )


@register(
    "rate_spikes_rollup",
    """
    WITH r AS (
      SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS tb,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT event_type, min(tb) AS lo FROM r GROUP BY 1),
    h AS (SELECT max(tb) AS hi FROM r),
    grid AS (
      SELECT b.event_type,
             unnest(generate_series(b.lo, h.hi, INTERVAL '5 minutes')) AS tb
      FROM b, h
    ),
    f AS (
      SELECT g.event_type, g.tb, coalesce(r.cnt, 0) AS cnt
      FROM grid g LEFT JOIN r ON r.event_type = g.event_type AND r.tb = g.tb
    ),
    w AS (
      SELECT event_type, tb, cnt,
             count(cnt) OVER win AS base_n,
             avg(CAST(cnt AS DOUBLE)) OVER win AS base_mean,
             sqrt(var_pop(CAST(cnt AS DOUBLE)) OVER win) AS base_std
      FROM f
      WINDOW win AS (PARTITION BY event_type ORDER BY CAST(epoch(tb) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           strftime(tb, '%Y-%m-%d %H:%M:%S') AS tb_s,
           cnt,
           base_n,
           round(base_mean, 6) AS base_mean,
           round(base_std, 6) AS base_std,
           CASE WHEN base_n >= 3 AND base_std > 0
                THEN round((CAST(cnt AS DOUBLE) - base_mean) / base_std, 6)
           END AS z,
           CASE WHEN base_n < 3 THEN FALSE ELSE
             coalesce((CAST(cnt AS DOUBLE) - base_mean) / base_std >= 4.0
                      AND base_std > 0, FALSE)
             OR (base_std = 0 AND base_mean > 0
                 AND CAST(cnt AS DOUBLE) >= base_mean * 3.0)
           END AS is_spike,
           CASE WHEN base_n < 3 THEN FALSE ELSE
             coalesce((CAST(cnt AS DOUBLE) - base_mean) / base_std <= -4.0
                      AND base_std > 0, FALSE)
             OR (base_std = 0 AND base_mean > 0
                 AND CAST(cnt AS DOUBLE) <= base_mean / 3.0)
           END AS is_drop
    FROM w
    """,
)
def rate_spikes_rollup(spark, sf_dir):
    """Observability alerting, driver-oracled end-to-end: 5-minute
    per-event-type rollup -> gap fill to the global horizon (zero
    buckets for silent series) -> trailing-time-range z-score with
    flat-baseline ratio fallback, spike AND drop flags
    (operators/anomaly.py). The DuckDB oracle replays ALL of it —
    time_bucket + generate_series grid + the RANGE window — so a green
    row certifies the rollup bucketing, the densify pass, and the
    whole score across two engines. Scale shape: one map-side-combined
    groupBy (the rollup), then window aggregates on the metadata-scale
    rollup; events are scanned once."""
    from ves_spark.operators.anomaly import detect_rate_spikes

    ev = load(spark, sf_dir, "events")
    roll = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("time_bucket"), "event_type", "cnt")
    )
    sp = detect_rate_spikes(
        roll,
        ["event_type"],
        time_col="time_bucket",
        value_col="cnt",
        lookback=12,
        bucket_width=300,
        fill_gaps=True,
    )
    return sp.select(
        "event_type",
        F.date_format("time_bucket", "yyyy-MM-dd HH:mm:ss").alias("tb_s"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("base_n").cast("long").alias("base_n"),
        F.round("base_mean", 6).alias("base_mean"),
        F.round("base_std", 6).alias("base_std"),
        F.round("z", 6).alias("z"),
        "is_spike",
        "is_drop",
    )


@register(
    "salted_skew_agg",
    """
    SELECT l_returnflag, count(*) AS cnt, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_skew_agg(spark, sf_dir):
    """Two-phase salted aggregation (explicit skew pattern): phase 1
    groups by (key, salt16), phase 2 merges. Identical result to the
    plain GROUP BY oracle — the point is the shape: no single reducer
    ever sees all rows of a hot key."""
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16))
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("l_quantity").alias("_s")
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("_c").alias("cnt"), F.sum("_s").alias("sum_qty")
    )


@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def latest_event_per_user(spark, sf_dir):
    """CDC/SCD-style 'current row per key' (the emulated MERGE INTO
    upsert read-side: reference checkpoint upsert semantics,
    src/watcher/watcher.rs:35-89, as a query)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
        )
    )


@register(
    "cdc_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey AS k, round(o_totalprice, 2) AS v
      FROM orders WHERE o_orderkey % 3 <> 0
    ), new AS (
      SELECT o_orderkey AS k,
             round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1 ELSE o_totalprice END, 2) AS v
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT coalesce(old.k, new.k) AS k,
           CASE WHEN old.k IS NULL THEN 'added'
                WHEN new.k IS NULL THEN 'removed'
                WHEN old.v <> new.v THEN 'changed'
                ELSE 'unchanged' END AS change
    FROM old FULL OUTER JOIN new ON old.k = new.k
    """,
)
def cdc_snapshot_diff(spark, sf_dir):
    """CDC classification over two catalog snapshots — the reference's
    WatcherEvent translation (FileDiscovered/FileRotated/FileRemoved,
    src/watcher/events.rs:18-65) as a full-outer-join diff tagged with
    when/otherwise. Snapshots here are deterministic slices of orders."""
    o = load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"), F.round("o_totalprice", 2).alias("v")
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.round(
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
            2,
        ).alias("v"),
    )
    j = old.alias("old").join(new.alias("new"), F.col("old.k") == F.col("new.k"), "full_outer")
    return j.select(
        F.coalesce(F.col("old.k"), F.col("new.k")).alias("k"),
        F.when(F.col("old.k").isNull(), "added")
        .when(F.col("new.k").isNull(), "removed")
        .when(F.col("old.v") != F.col("new.v"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )


# =====================================================================
# Third operator batch: training-data sampling + vocabulary stats.
# Cross-engine determinism: the 'random' is a 32-bit hash of the first
# 8 hex digits of md5(doc_id) — identical in Spark (conv) and DuckDB
# (positional hex-digit decode).
# =====================================================================


def _spark_md5_32(col):
    return spark_md5_int(col, 8)


_DUCK_MD5_32 = duck_md5_int_sql("doc_id", 8)


@register(
    "vocab_topk_words",
    """
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), c AS (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word
    )
    SELECT word, cnt, rnk FROM (
      SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word) AS rnk
      FROM c) t
    WHERE rnk <= 100
    """,
)
def vocab_topk_words(spark, sf_dir):
    """Vocabulary frequency top-k — the token-histogram primitive of
    every training-data pipeline. Scale shape: explode is map-side,
    the groupBy ships (word, partial count) only, and the final top-k
    is a single small sort after aggregation."""
    d = load(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # distributed top-k (TakeOrderedAndProject) FIRST, then the global
    # row_number window runs over only 100 rows — never a full-vocab
    # single-partition sort
    top = c.orderBy(F.col("cnt").desc(), F.col("word")).limit(100)
    w = W.orderBy(F.col("cnt").desc(), F.col("word"))
    return top.withColumn("rnk", F.row_number().over(w))


@register(
    "sample_documents",
    f"""
    SELECT 'hash20' AS strategy, doc_id, lang
    FROM documents
    WHERE ({_DUCK_MD5_32}) % 100 < 20
    UNION ALL
    SELECT 'quota10' AS strategy, doc_id, lang FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ({_DUCK_MD5_32}) % 1000000, doc_id) AS rn
      FROM documents) t
    WHERE rn <= 10
    UNION ALL
    SELECT 'split_' || CASE WHEN m < 90 THEN 'train'
                            WHEN m < 95 THEN 'val'
                            ELSE 'test' END AS strategy, doc_id, lang
    FROM (SELECT doc_id, lang, ({_DUCK_MD5_32}) % 100 AS m FROM documents) t
    UNION ALL
    SELECT 'mix_sqrt' AS strategy, doc_id, lang
    FROM (
      SELECT d.doc_id, d.lang, ({_DUCK_MD5_32}) % 1000000 AS h, r.thr
      FROM documents d
      JOIN (
        SELECT source,
               CAST(floor(1000000 * sqrt((min(cnt) OVER ()) * 1.0 / cnt))
                    AS BIGINT) AS thr
        FROM (SELECT source, count(*) AS cnt FROM documents GROUP BY source) c
      ) r USING (source)
    ) mx
    WHERE h < thr
    """,
)
def sample_documents(spark, sf_dir):
    """Both training-set sampling primitives in one driver check
    (merged to keep the registry within the driver's 50-query cap):

    * hash20 — deterministic 20% Bernoulli sample by content-
      independent hash of the key: reproducible across runs/engines
      (unlike rand()), uniform, a pure scan-side filter (no shuffle);
    * quota10 — per-group quota sampling (10 docs per language) via
      hash-ordered row_number: the balanced-mixture primitive; one
      shuffle on the group key, hash order makes the 'random' pick
      deterministic and engine-independent;
    * split_train/val/test — deterministic 90/5/5 holdout assignment
      by the same key hash: every doc gets exactly one split, stable
      across runs/engines/reshards (the property rand() cannot give),
      again a pure scan-side projection with no shuffle;
    * mix_sqrt — temperature-weighted source mixing (alpha = 0.5):
      per-source keep-rate sqrt(n_min/n_s) rebalances the mixture
      toward p_s proportional to sqrt(n_s), the standard flattening
      for over-represented pretraining sources. Rates derive from one
      map-side-combined count per source (metadata-sized), the rate
      table broadcast-joins back, the keep decision is the same
      deterministic key hash — at 100 TB this is one tiny agg plus a
      scan-side filter, no corpus shuffle. Every float step (divide,
      sqrt, scale, floor) is a single correctly-rounded IEEE-754 op,
      so DuckDB replays the thresholds bit-for-bit."""
    d = load(spark, sf_dir, "documents")
    hash20 = (
        d.filter(_spark_md5_32(F.col("doc_id")) % 100 < 20)
        .select(F.lit("hash20").alias("strategy"), "doc_id", "lang")
    )
    w = W.partitionBy("lang").orderBy(
        (_spark_md5_32(F.col("doc_id")) % 1000000).asc(), F.col("doc_id").asc()
    )
    quota10 = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(F.lit("quota10").alias("strategy"), "doc_id", "lang")
    )
    m = _spark_md5_32(F.col("doc_id")) % 100
    split = d.select(
        F.concat(
            F.lit("split_"),
            F.when(m < 90, F.lit("train"))
            .when(m < 95, F.lit("val"))
            .otherwise(F.lit("test")),
        ).alias("strategy"),
        "doc_id",
        "lang",
    )
    counts = d.groupBy("source").count()
    rates = counts.select(
        "source",
        F.floor(
            F.lit(1000000)
            * F.sqrt(F.min("count").over(W.partitionBy()) / F.col("count"))
        ).alias("thr"),
    )
    mix = (
        d.join(F.broadcast(rates), "source")
        .filter(_spark_md5_32(F.col("doc_id")) % 1000000 < F.col("thr"))
        .select(F.lit("mix_sqrt").alias("strategy"), "doc_id", "lang")
    )
    return hash20.unionByName(quota10).unionByName(split).unionByName(mix)


@register(
    "stream_dedup_docs",
    """
    SELECT doc_id, source, lang FROM documents
    """,
)
def stream_dedup_docs(spark, sf_dir):
    """Streaming exactly-once-by-identity, driver-oracled: the
    documents table is delivered TWICE (two identical parquet files =
    two micro-batches under maxFilesPerTrigger=1 — an injected
    redelivery) and streamed through ``dedup_stream``
    (dropDuplicatesWithinWatermark on doc_id); the memory sink must
    hold every doc exactly once, so the batch oracle is simply the
    table itself. Deterministic regardless of micro-batch order
    because the two deliveries are identical copies. Re-expresses the
    reference's checkpoint-identity skip (discovery.rs:33-35) on the
    live-tail path; the batch path's equivalent is the lineage
    anti-join."""
    import hashlib
    import os as _os
    import shutil
    import tempfile

    from ves_spark.streaming.stream_pipeline import dedup_stream

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    # stable md5 base per sf_dir + pid (same discipline as the other
    # stream queries): same-process reruns reuse-and-clean ONE dir and
    # ONE memory-sink view instead of leaking a corpus copy and a
    # fresh temp view per invocation; the pid keeps concurrent DRIVER
    # PROCESSES apart. Two concurrent invocations inside one process
    # would collide (shared dir + duplicate query name) — this is a
    # driver-harness fixture, invoked serially by bench/correctness
    # runs, never a concurrent library API.
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    work = (
        f"{tempfile.gettempdir()}/ves_streamdedup_{tag}_{_os.getpid()}"
    )
    shutil.rmtree(work, ignore_errors=True)
    src = _os.path.join(work, "in")
    d.coalesce(1).write.parquet(src)
    d.coalesce(1).write.mode("append").parquet(src)  # the redelivery

    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    qname = f"sdq_{tag}"
    q = (
        dedup_stream(stream, key="doc_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # rows live in the memory sink now; drop the on-disk copies
    shutil.rmtree(work, ignore_errors=True)
    return spark.sql(f"SELECT doc_id, source, lang FROM {qname}")
