"""More canonical TPC-H query shapes (Q4/Q10/Q12/Q14/Q18), adapted to
the fixture's 1995-2001 date range.  Each exercises a distinct plan
topology the engine must keep efficient at scale; the docstrings name
the topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.exact import dsum, dsum_sql
from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table

_DEC = "decimal(38,6)"


def q_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: date-filtered semi join + count by category (EXISTS
    against the fact table, aggregation on the dimension side)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1997-01-01")
                     .cast("timestamp")).select("l_orderkey")
    return (
        orders
        .filter((F.col("o_orderdate") >= F.lit("1997-01-01")
                 .cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-07-01")
                   .cast("timestamp")))
        .join(late, F.col("o_orderkey") == F.col("l_orderkey"),
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(QuerySpec(
    "priority_count", q_priority_count,
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > TIMESTAMP '1997-01-01')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: date-filtered EXISTS + category count",
    tags=("join", "semi", "agg"),
))


def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: fact filter (returns) → join spine → top-k customers
    by lost revenue."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue, "lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


register(QuerySpec(
    "returned_revenue", q_returned_revenue,
    oracle="""
        SELECT c_custkey, c_name, n_name, {lost}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
    """.format(lost=dsum_sql(
        "l_extendedprice * (1 - l_discount)", "lost_revenue")),
    doc="TPC-H Q10 shape: selective fact filter + join spine + top-k",
    tags=("join", "agg", "topk"),
))


def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + conditional two-way classification (CASE
    aggregation) by a derived category."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    is_urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    qty_class = (F.when(F.col("l_quantity") >= 25, "bulk")
                 .otherwise("small"))
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01")
                   .cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01")
                     .cast("timestamp")))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("qty_class", qty_class)
        .groupBy("qty_class")
        .agg(F.count(F.when(is_urgent, 1)).alias("high_line_count"),
             F.count(F.when(~is_urgent, 1)).alias("low_line_count"))
        .orderBy("qty_class")
    )


register(QuerySpec(
    "shipmode_priority", q_shipmode_priority,
    oracle="""
        SELECT CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END
                   AS qty_class,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN
                          ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    doc="TPC-H Q12 shape: join + CASE classification agg",
    tags=("join", "agg", "conditional"),
))


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: global ratio of a conditional aggregate to a total —
    two exact decimal sums, divided once in double."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    is_promo = F.col("p_type").startswith("PROMO")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1997-03-01")
                   .cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-04-01")
                     .cast("timestamp")))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.sum(F.when(is_promo, revenue).otherwise(F.lit(0.0))
                   .cast(_DEC)).cast("double")
             / F.sum(revenue.cast(_DEC)).cast("double") * 100.0)
            .alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


register(QuerySpec(
    "promo_share", q_promo_share,
    oracle="""
        SELECT CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                   THEN l_extendedprice * (1 - l_discount)
                   ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(38,6))) AS DOUBLE) * 100.0
                   AS promo_share_pct,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14 shape: conditional/total ratio (promo revenue %)",
    tags=("join", "agg", "ratio"),
))


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING on a fact-side aggregate, then join back for
    detail rows — the aggregate runs first so the join input is tiny."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(dsum("l_quantity", "total_qty"))
           .filter(F.col("total_qty") > 120.0))
    return (
        big
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd")
                .alias("order_date"),
                "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(50)
    )


register(QuerySpec(
    "large_volume_customers", q_large_volume_customers,
    oracle="""
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_totalprice, total_qty
        FROM (
            SELECT l_orderkey, {qty}
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                   AS DOUBLE) > 120.0
        ) b
        JOIN orders ON b.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 50
    """.format(qty=dsum_sql("l_quantity", "total_qty")),
    doc="TPC-H Q18 shape: HAVING aggregate then join-back + top-k",
    tags=("join", "agg", "having", "topk"),
))



def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total via a window over an aggregate (the scalar-
    subquery-in-SELECT shape, decorrelated into a windowed agg)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window
    per_status = (orders.groupBy("o_orderstatus")
                  .agg(F.sum(F.col("o_totalprice")
                             .cast("decimal(38,6)")).alias("s"),
                       F.count("*").alias("n_orders")))
    return (per_status
            .select(
                "o_orderstatus", "n_orders",
                F.col("s").cast("double").alias("status_total"),
                (F.col("s").cast("double")
                 / F.sum("s").over(
                     Window.partitionBy()).cast("double") * 100.0)
                .alias("pct_of_total")))


register(QuerySpec(
    "share_of_total", q_share_of_total,
    oracle="""
        WITH per_status AS (
            SELECT o_orderstatus,
                   SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS s,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, n_orders,
               CAST(s AS DOUBLE) AS status_total,
               CAST(s AS DOUBLE)
                   / CAST(SUM(s) OVER () AS DOUBLE) * 100.0
                   AS pct_of_total
        FROM per_status
    """,
    doc="percent-of-total (windowed grand total over aggregate)",
    tags=("window", "agg", "ratio"),
))


def q_date_trunc_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing with date_trunc (week boundaries are the
    calendar semantics integer DIV can't express)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders
        .withColumn("order_week",
                    F.date_format(F.date_trunc("week", "o_orderdate"),
                                  "yyyy-MM-dd"))
        .groupBy("order_week")
        .agg(F.count("*").alias("n_orders"),
             dsum("o_totalprice", "week_total"))
        .orderBy("order_week")
    )


register(QuerySpec(
    "date_trunc_buckets", q_date_trunc_buckets,
    oracle="""
        SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')
                   AS order_week,
               COUNT(*) AS n_orders,
               {week_total}
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """.format(week_total=dsum_sql("o_totalprice", "week_total")),
    doc="calendar week bucketing via date_trunc",
    tags=("date", "agg"),
))


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the pure scan-filter-aggregate — a single fact-table
    pass whose predicate (date range + discount band + quantity cap)
    must reach the parquet reader as pushed filters, with no join and
    no shuffle beyond the final partial-sum merge.  At 100 TB this is
    the query where predicate pushdown + column pruning decide whether
    you read 3 columns of a year or the whole table; the plan is one
    WholeStageCodegen over the scan feeding a 2-phase agg."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"),
                  "revenue"))
    )


register(QuerySpec(
    "forecast_revenue", q_forecast_revenue,
    oracle="""
        SELECT {rev}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """.format(rev=dsum_sql("l_extendedprice * l_discount", "revenue")),
    doc="TPC-H Q6 shape: pushdown-only scan + global aggregate",
    tags=("scan", "agg", "tpch"),
))
