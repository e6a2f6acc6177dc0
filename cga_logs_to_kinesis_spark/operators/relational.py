"""Relational operator surface (SURVEY.md §2.6), oracle-checked.

The reference computes only one aggregation — the 5-second tumbling
delivery-stats window (reference ``batchproducer.go:446-458``,
``main.go:147-152``) — and one predicate (the glob match,
``main.go:303``).  Everything else here is the relational layer the
driver contract validates against DuckDB: scans, filter/project,
joins (broadcast / shuffle / semi / anti), hash aggregation, distinct,
rollup/cube, window functions, set ops, sort/limit/top-k, and the
scalar-function gallery.  All of it is pure built-in DataFrame API so
Catalyst supplies pushdown, pruning, join selection, and AQE.

Exactness conventions (see functions/exact.py): double sums go through
DECIMAL so results are order-independent; time bucketing is integer
arithmetic on the int64-ns ``ts`` column; timestamps leave queries as
formatted strings so both engines render identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cga_logs_to_kinesis_spark.functions.exact import (
    davg_sql,
    dsum,
    dsum_sql,
)
from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_events, load_table

_DEC = "decimal(38,6)"


# ---------------------------------------------------------------------------
# Flagship: the reference's A1 stats aggregation as a batch query.
# 5-second tumbling window x origin-like key, count + sum — exactly the
# StatsBatch the reference emits per StatInterval (batchproducer.go:54-62,
# 446-458; interval config main.go:91), recast over the events fixture.
# Bucketing is integer division on int64 nanoseconds: exact, codegen'd,
# and identical in any engine — no float time math.
# ---------------------------------------------------------------------------

def q_stats_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev
        .withColumn("window_start_s",
                    (F.expr("ts DIV 5000000000") * 5).cast("long"))
        .groupBy("window_start_s", "event_type")
        .agg(F.count("*").alias("n_events"),
             dsum("value", "sum_value"))
    )


register(QuerySpec(
    "stats_tumbling", q_stats_tumbling,
    oracle="""
        SELECT (epoch_ns(ts) // 5000000000) * 5 AS window_start_s,
               event_type,
               COUNT(*) AS n_events,
               {sum_value}
        FROM events
        GROUP BY 1, 2
    """.format(sum_value=dsum_sql("value", "sum_value")),
    doc="A1 delivery-stats tumbling window (reference batchproducer.go:446-458)",
    tags=("agg", "window-time", "flagship"),
))


# ---------------------------------------------------------------------------
# Filter + project: predicate pushdown showcase.  The filters reach the
# parquet scan (asserted in tests/test_plans.py) so at 100 TB row-group
# stats skip most of the file.
# ---------------------------------------------------------------------------

def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li
        .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_discount") >= 0.05)
                & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24.0))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            (F.col("l_extendedprice") * F.col("l_discount"))
            .alias("disc_revenue"),
        )
    )


register(QuerySpec(
    "filter_project", q_filter_project,
    oracle="""
        SELECT l_orderkey AS orderkey,
               l_linenumber AS linenumber,
               l_extendedprice * l_discount AS disc_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24.0
    """,
    doc="pushdown-friendly filter + narrow projection (TPC-H Q6 shape)",
    tags=("scan", "filter", "project"),
))


# ---------------------------------------------------------------------------
# Hash aggregation: TPC-H Q1 pricing summary.  Partial (map-side)
# aggregation is automatic for hash aggregates; the only shuffle moves
# pre-aggregated groups, so the plan is scale-stable.
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
             / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_discount").cast(_DEC)).cast("double")
             / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(QuerySpec(
    "pricing_summary", q_pricing_summary,
    oracle="""
        SELECT l_returnflag, l_linestatus,
               {sum_qty},
               {sum_base_price},
               {sum_disc_price},
               {sum_charge},
               {avg_qty},
               {avg_disc},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """.format(
        sum_qty=dsum_sql("l_quantity", "sum_qty"),
        sum_base_price=dsum_sql("l_extendedprice", "sum_base_price"),
        sum_disc_price=dsum_sql(
            "l_extendedprice * (1 - l_discount)", "sum_disc_price"),
        sum_charge=dsum_sql(
            "l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
        avg_qty=davg_sql("l_quantity", "avg_qty"),
        avg_disc=davg_sql("l_discount", "avg_disc"),
    ),
    doc="TPC-H Q1 pricing summary: multi-aggregate hash agg",
    tags=("agg",),
))


# ---------------------------------------------------------------------------
# Joins.  Dimension tables (region/nation/customer/supplier/part) are
# tiny relative to facts at any scale — broadcast them explicitly so the
# fact table never shuffles for the join.  The lineitem⋈orders spine is
# a shuffle (sort-merge / AQE-chosen) on the natural key.
# ---------------------------------------------------------------------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # customer is deliberately NOT broadcast-hinted: it grows with SF
    # (150k x sf rows), so at the 100 TB north star a forced broadcast
    # is an executor OOM that AQE cannot rescue (hints win over the
    # size threshold).  nation/region are constant-size (25/5 rows) —
    # those hints are always safe.  Below the 32 MiB threshold AQE
    # still picks a broadcast join for customer on its own; the
    # degradation is pinned by
    # tests/test_plans.py::test_customer_join_adapts_to_size.
    return (
        li
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"), F.count("*").alias("n_items"))
    )


register(QuerySpec(
    "revenue_by_nation", q_revenue_by_nation,
    oracle="""
        SELECT r_name, n_name,
               {revenue},
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """.format(revenue=dsum_sql(
        "l_extendedprice * (1 - l_discount)", "revenue")),
    doc="multiway join: fact spine shuffle + broadcast dims (TPC-H Q5 shape)",
    tags=("join", "broadcast", "agg"),
))


def q_segment_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # No broadcast hint on customer (scale-proportional table) — see
    # q_revenue_by_nation.  The size threshold / AQE decides.
    return (
        orders
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             dsum("o_totalprice", "total_price"))
    )


register(QuerySpec(
    "segment_totals", q_segment_totals,
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               {total_price}
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """.format(total_price=dsum_sql("o_totalprice", "total_price")),
    doc="broadcast dim join + agg",
    tags=("join", "broadcast", "agg"),
))


def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


register(QuerySpec(
    "semi_join_customers", q_customers_with_orders,
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-semi join (EXISTS)",
    tags=("join", "semi"),
))


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT-priority order.  The right side is
    filtered BEFORE the anti-join (the filter must push below the
    join build).  Anti-joining against all orders was vacuous at the
    driver-gate scale — every sf0.01 customer has at least one order,
    so the hash match was over an empty result and pinned nothing
    about the anti-join's match semantics; this predicate yields
    ~200 rows at sf0.01 and ~2000 at sf0.1."""
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (
        cust
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


register(QuerySpec(
    "anti_join_customers", q_customers_without_orders,
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    doc="left-anti join (NOT EXISTS) with filtered right side — "
        "non-vacuous at every fixture scale",
    tags=("join", "anti"),
))


# ---------------------------------------------------------------------------
# Distinct aggregation.  Exact COUNT(DISTINCT) expands to a two-phase
# agg in Spark (distinct-expand + final) — fine at scale because the
# first phase is partial per partition.
# ---------------------------------------------------------------------------

def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count("*").alias("n_events"))
    )


register(QuerySpec(
    "distinct_users", q_distinct_users,
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    doc="exact distinct aggregation",
    tags=("agg", "distinct"),
))


# ---------------------------------------------------------------------------
# Window functions.  Running sums go through DECIMAL (exactness note in
# functions/exact.py): DuckDB's segment-tree window accumulation and
# Spark's running accumulation associate float additions differently,
# decimal addition doesn't care.
# ---------------------------------------------------------------------------

def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
    return (
        orders
        .withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


register(QuerySpec(
    "top3_orders_per_customer", q_top3_orders_per_customer,
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rank_in_cust
            FROM orders
        ) WHERE rank_in_cust <= 3
    """,
    doc="per-group top-k via row_number window",
    tags=("window",),
))


def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w)
            .cast("double").alias("running_total"),
            # lag default -1.0 (not NULL): first-row NULL would render
            # NaN through the oracle's pandas path but NULL from Spark
            F.lag("o_totalprice", 1, -1.0).over(
                Window.partitionBy("o_custkey")
                .orderBy("o_orderdate", "o_orderkey")).alias("prev_price"),
        )
    )


register(QuerySpec(
    "running_revenue", q_running_revenue,
    oracle="""
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total,
               LAG(o_totalprice, 1, -1.0) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_price
        FROM orders
    """,
    doc="running sum + lag window frame",
    tags=("window",),
))


# ---------------------------------------------------------------------------
# Rollup / cube (grouping sets).
# ---------------------------------------------------------------------------

def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"),
             dsum("l_quantity", "sum_qty"),
             F.grouping_id().alias("gid"))
    )


register(QuerySpec(
    "rollup_pricing", q_rollup_pricing,
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               {sum_qty},
               GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.format(sum_qty=dsum_sql("l_quantity", "sum_qty")),
    doc="ROLLUP grouping sets with grouping_id",
    tags=("agg", "rollup"),
))


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             dsum("o_totalprice", "total_price"))
    )


register(QuerySpec(
    "cube_orders", q_cube_orders,
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {total_price}
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """.format(total_price=dsum_sql("o_totalprice", "total_price")),
    doc="CUBE grouping sets",
    tags=("agg", "cube"),
))


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------

def q_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cust_nations = (cust.join(F.broadcast(nation),
                              F.col("c_nationkey") == F.col("n_nationkey"))
                    .select("n_name"))
    supp_nations = (supp.join(F.broadcast(nation),
                              F.col("s_nationkey") == F.col("n_nationkey"))
                    .select("n_name"))
    both = (cust_nations.intersect(supp_nations)
            .withColumn("membership", F.lit("both")))
    cust_only = (cust_nations.distinct().exceptAll(supp_nations.distinct())
                 .withColumn("membership", F.lit("customer_only")))
    supp_only = (supp_nations.distinct().exceptAll(cust_nations.distinct())
                 .withColumn("membership", F.lit("supplier_only")))
    return both.unionAll(cust_only).unionAll(supp_only)


register(QuerySpec(
    "nation_set_ops", q_nation_set_ops,
    oracle="""
        WITH cn AS (SELECT n_name FROM customer
                    JOIN nation ON c_nationkey = n_nationkey),
             sn AS (SELECT n_name FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey)
        SELECT n_name, 'both' AS membership
        FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
        UNION ALL
        SELECT n_name, 'customer_only' AS membership
        FROM (SELECT DISTINCT n_name FROM cn
              EXCEPT ALL SELECT DISTINCT n_name FROM sn)
        UNION ALL
        SELECT n_name, 'supplier_only' AS membership
        FROM (SELECT DISTINCT n_name FROM sn
              EXCEPT ALL SELECT DISTINCT n_name FROM cn)
    """,
    doc="INTERSECT / EXCEPT ALL / UNION ALL",
    tags=("setop",),
))


# ---------------------------------------------------------------------------
# Sort / limit / global top-k.  A global ORDER BY + LIMIT k compiles to
# TakeOrderedAndProject: per-partition top-k heaps then a k-row merge on
# the driver — no global sort shuffle, safe at any scale.
# ---------------------------------------------------------------------------

def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(),
                 F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(100)
    )


register(QuerySpec(
    "global_topk", q_global_topk,
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
    doc="global top-k (TakeOrderedAndProject, no full sort)",
    tags=("sort", "limit"),
))


# ---------------------------------------------------------------------------
# Scalar-function gallery: string / date / math built-ins that stay in
# whole-stage codegen.  Fractional rounding goes through decimal casts
# (engine-identical) rather than ROUND-on-double.
# ---------------------------------------------------------------------------

def q_scalar_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("type_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.col("p_retailprice").cast("decimal(18,2)")
        .cast("double").alias("price_2dp"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small").alias("size_class"),
    )


register(QuerySpec(
    "scalar_gallery", q_scalar_gallery,
    oracle="""
        SELECT p_partkey AS partkey,
               UPPER(p_name) AS name_upper,
               LENGTH(p_name) AS name_len,
               SUBSTRING(p_brand, 1, 5) AS brand_prefix,
               -- DuckDB regexp_extract: NULL on no-match (Spark: '')
               -- but also NULL on NULL input (Spark: NULL) — coalesce
               -- only the no-match case
               CASE WHEN p_type IS NULL THEN NULL
                    ELSE COALESCE(regexp_extract(p_type, '([A-Z]+)', 1),
                                  '') END AS type_word,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               p_size % 7 AS size_mod,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE)
                   AS price_2dp,
               CASE WHEN p_size >= 25 THEN 'large'
                    WHEN p_size >= 10 THEN 'medium'
                    ELSE 'small' END AS size_class
        FROM part
    """,
    doc="string/math/conditional scalar functions (codegen path)",
    tags=("scalar",),
))


def q_date_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders
        .withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .groupBy("order_year", "order_month")
        .agg(F.count("*").alias("n_orders"),
             dsum("o_totalprice", "total_price"),
             F.min(F.date_format("o_orderdate", "yyyy-MM-dd"))
             .alias("first_order_date"))
        .orderBy("order_year", "order_month")
    )


register(QuerySpec(
    "date_gallery", q_date_gallery,
    oracle="""
        SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
               EXTRACT(MONTH FROM o_orderdate) AS order_month,
               COUNT(*) AS n_orders,
               {total_price},
               MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_order_date
        FROM orders
        GROUP BY 1, 2
        ORDER BY 1, 2
    """.format(total_price=dsum_sql("o_totalprice", "total_price")),
    doc="date extraction / formatting + agg",
    tags=("scalar", "date", "agg"),
))


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "value")
        .withColumn("k_bucket", (F.col("k") % 10).cast("long"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"),
             dsum("value", "sum_value"))
    )


register(QuerySpec(
    "json_props", q_json_props,
    oracle="""
        -- json_valid guard: Spark's get_json_object yields NULL on
        -- malformed JSON while DuckDB's json_extract_string errors
        SELECT (CASE WHEN json_valid(props)
                     THEN CAST(json_extract_string(props, '$.k')
                               AS BIGINT) END % 10) AS k_bucket,
               COUNT(*) AS n,
               {sum_value}
        FROM events
        GROUP BY 1
    """.format(sum_value=dsum_sql("value", "sum_value")),
    doc="JSON field extraction from string column + agg",
    tags=("scalar", "json"),
))


def q_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    bucket = (F.expr("ts DIV 3600000000000")).cast("long")
    return (
        ev
        .withColumn("hour_bucket", bucket)
        .groupBy("hour_bucket")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .alias("n_purchase"),
            F.count(F.when(F.col("event_type") == "error", 1))
            .alias("n_error"),
            dsum(F.when(F.col("event_type") == "purchase",
                        F.col("value")).otherwise(F.lit(0.0)),
                 "purchase_value"),
        )
    )


register(QuerySpec(
    "conditional_pivot", q_conditional_pivot,
    oracle="""
        SELECT (epoch_ns(ts) // 3600000000000) AS hour_bucket,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                   AS n_purchase,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               {purchase_value}
        FROM events
        GROUP BY 1
    """.format(purchase_value=dsum_sql(
        "CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END",
        "purchase_value")),
    doc="conditional aggregation (manual pivot)",
    tags=("agg", "conditional"),
))
