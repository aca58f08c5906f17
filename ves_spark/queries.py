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
    "anti_join_inactive_customers",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_inactive_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "semi_join_active_customers",
    """
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000)
    """,
)
def semi_join_active_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "left_join_default",
    """
    SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
           count(*) AS cnt, round(sum(o.o_totalprice), 2) AS total
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY coalesce(c.c_mktsegment, 'UNKNOWN')
    """,
)
def left_join_default(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .withColumn("segment", F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


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
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def time_bucket_rollup(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_bucket"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


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
    e = load(spark, sf_dir, "events")
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
    "window_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
    WHERE rnk <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "sort_limit_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def sort_limit_topk(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(20)
    )


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
    "set_ops_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_ops_users(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    u = lambda t: e.filter(F.col("event_type") == t).select("user_id")  # noqa: E731
    # intersect/subtract are the DISTINCT set ops, matching SQL
    # INTERSECT / EXCEPT.
    return u("purchase").intersect(u("click")).subtract(u("error"))


@register(
    "distinct_users_per_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# =====================================================================
# Grouping sets / rollup / pivot
# =====================================================================


@register(
    "rollup_cube",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
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
    SELECT o_orderkey,
           upper(o_orderpriority) AS prio_upper,
           substr(o_orderstatus, 1, 1) AS status_c,
           length(o_orderpriority) AS prio_len,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           round(abs(o_totalprice - 100000.0), 2) AS dist_100k,
           round(sqrt(o_totalprice), 4) AS sqrt_price,
           concat(o_orderstatus, '-', o_orderpriority) AS tag
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def scalar_functions(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
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
