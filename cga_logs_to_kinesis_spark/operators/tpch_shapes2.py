"""The remaining canonical TPC-H plan topologies (Q7/Q8/Q13/Q15/Q17/
Q19/Q21/Q22), adapted to the fixture schema (no partsupp, phone,
container, comment or receipt/commit dates — each adaptation keeps the
*plan shape* and swaps the predicate onto an available column).

Why these matter at 100 TB: each exercises a distinct optimizer
behavior the engine must keep efficient at scale —

- Q7/Q8: 6-to-8-table join trees where only the two fact tables may
  shuffle; every dimension must broadcast.
- Q13: outer join with a join-condition filter + double aggregation.
- Q15: aggregate → scalar-max → self-filter (the "view + scalar
  subquery" shape), with the max broadcast rather than recomputed.
- Q17: correlated scalar subquery decorrelated into a groupBy+join
  (per-part average), the classic magic-decorrelation shape.
- Q19: disjunctive multi-column predicates — Catalyst must keep the
  OR-of-ANDs inside the join filter without exploding the plan.
- Q21: double-correlated EXISTS / NOT EXISTS over the same fact,
  decorrelated into one per-order aggregate joined back (the fact
  table is scanned twice, never three times).
- Q22: anti join + broadcast scalar threshold.

All additive aggregates use the exact-decimal helpers
(`functions/exact.py`) so results are bit-identical to the DuckDB
oracle regardless of partitioning; scalar thresholds (Q17's 0.2*avg,
Q22's avg balance) are single IEEE ops on deterministic inputs, so the
comparisons are also engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.exact import (
    davg, davg_sql, dsum, dsum_sql)
from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table

_DEC = "decimal(38,6)"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-nation trade volume by year over a small nation
    set.  The fact spine (lineitem ⋈ orders) shuffles on orderkey;
    customer, supplier and the pre-filtered four-row nation table all
    broadcast, so the only exchange at 100 TB is the one the
    fact-fact join forces."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = nation.filter(F.col("n_name").isin(
        "NATION_1", "NATION_2", "NATION_3", "NATION_4"))
    n1 = pair.select(F.col("n_nationkey").alias("s_nkey"),
                     F.col("n_name").alias("supp_nation"))
    n2 = pair.select(F.col("n_nationkey").alias("c_nkey"),
                     F.col("n_name").alias("cust_nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((F.col("l_shipdate") >= _ts("1996-01-01"))
                  & (F.col("l_shipdate") < _ts("1998-01-01")))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(revenue, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register(QuerySpec(
    "volume_shipping", q_volume_shipping,
    oracle="""
        SELECT supp_nation, cust_nation, l_year, {rev}
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND n1.n_name IN ('NATION_1','NATION_2',
                                'NATION_3','NATION_4')
              AND n2.n_name IN ('NATION_1','NATION_2',
                                'NATION_3','NATION_4')
              AND n1.n_name <> n2.n_name
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """.format(rev=dsum_sql("volume", "revenue")),
    doc="TPC-H Q7 shape: nation-pair trade volume, 6-table join",
    tags=("join", "broadcast", "agg"),
))


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's market for one part
    type, by year.  Eight relations; part is filtered then broadcast
    so the selective predicate prunes lineitem at the join, and the
    share is a conditional/total ratio of exact sums."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n_c = nation.select(F.col("n_nationkey").alias("c_nkey"),
                        F.col("n_regionkey").alias("c_rkey"))
    n_s = nation.select(F.col("n_nationkey").alias("s_nkey"),
                        F.col("n_name").alias("supp_nation"))
    america = region.filter(F.col("r_name") == "AMERICA")
    return (
        li
        .join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01")))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(america.select("r_regionkey")),
              F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            (F.sum(F.when(F.col("supp_nation") == "NATION_3", volume)
                   .otherwise(F.lit(0.0)).cast(_DEC)).cast("double")
             / F.sum(volume.cast(_DEC)).cast("double"))
            .alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_year")
    )


register(QuerySpec(
    "market_share", q_market_share,
    oracle="""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
                    THEN l_extendedprice * (1 - l_discount)
                    ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q8 shape: national market share in a region, 8-relation join",
    tags=("join", "broadcast", "agg", "ratio"),
))


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT JOIN with a filter that belongs in the join
    condition (not WHERE — customers with zero qualifying orders must
    survive), then a distribution over the per-customer counts."""
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    qualifying = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.select("c_custkey")
        .join(qualifying.select("o_custkey", "o_orderkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


register(QuerySpec(
    "customer_distribution", q_customer_distribution,
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: outer join + double aggregation (order-count "
        "distribution)",
    tags=("join", "outer", "agg"),
))


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue 'view' per supplier over a quarter, then the
    supplier(s) hitting the maximum.  The max is a 1-row broadcast, so
    the revenue aggregate is computed once, not twice — and the
    equality works because both sides are the same exact-decimal sum."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (li.filter((F.col("l_shipdate") >= _ts("1997-01-01"))
                     & (F.col("l_shipdate") < _ts("1997-04-01")))
           .groupBy("l_suppkey")
           .agg(dsum(revenue, "total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx),
                 F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


register(QuerySpec(
    "top_supplier", q_top_supplier,
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey, {rev}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """.format(rev=dsum_sql("l_extendedprice * (1 - l_discount)",
                            "total_revenue")),
    doc="TPC-H Q15 shape: aggregate view + scalar-max self-filter",
    tags=("agg", "scalar", "join"),
))


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a groupBy over the full fact + join —
    the fact table is scanned twice but never nested-loop probed.  The
    threshold 0.2*avg is one IEEE multiply on a deterministic double,
    so the comparison is engine-exact."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = (li.groupBy(F.col("l_partkey").alias("pp_partkey"))
                .agg(davg("l_quantity", "avg_qty")))
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")
                            .select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pp_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
              / F.lit(7.0)).alias("avg_yearly"),
             F.count("*").alias("n_items"))
    )


register(QuerySpec(
    "small_qty_revenue", q_small_qty_revenue,
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                    AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN (
            SELECT l_partkey AS pp_partkey, {avg}
            FROM lineitem GROUP BY l_partkey
        ) pp ON l_partkey = pp_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < 0.2 * avg_qty
    """.format(avg=davg_sql("l_quantity", "avg_qty")),
    doc="TPC-H Q17 shape: decorrelated per-part average threshold",
    tags=("join", "agg", "decorrelate"),
))


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across columns of both join sides.  The
    per-arm part predicates (brand+size) stay on the broadcast build
    side; the quantity bounds apply post-join — Catalyst keeps the
    disjunction as one join filter instead of a 3-way union."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    arm = [
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11)),
        ((F.col("p_brand") == "Brand#2")
         & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(10, 20)),
        ((F.col("p_brand") == "Brand#3")
         & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(20, 30)),
    ]
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm[0] | arm[1] | arm[2])
        .agg(dsum(revenue, "revenue"), F.count("*").alias("n_items"))
    )


register(QuerySpec(
    "disjunctive_revenue", q_disjunctive_revenue,
    oracle="""
        SELECT {rev}, COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """.format(rev=dsum_sql("l_extendedprice * (1 - l_discount)",
                            "revenue")),
    doc="TPC-H Q19 shape: disjunctive multi-column join predicate",
    tags=("join", "disjunction", "agg"),
))


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the *only* late shipper on a
    finalized multi-supplier order.  The reference formulation is a
    correlated EXISTS plus NOT EXISTS on the same fact; decorrelated
    here into one per-order aggregate (distinct suppliers, distinct
    late suppliers) joined back — two scans of lineitem total, and the
    heavy shuffles are all on l_orderkey so AQE can coalesce them.
    'Late' is adapted to the fixture (no receipt/commit dates) as
    shipping >60 days after the order date."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    lo = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(orders.select("o_orderkey", "o_orderstatus",
                              "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .withColumn("is_late",
                      F.col("l_shipdate")
                      > F.col("o_orderdate")
                      + F.expr("INTERVAL 60 DAYS")))
    per_order = (lo.groupBy(F.col("l_orderkey").alias("agg_okey"))
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(
                          F.when(F.col("is_late"), F.col("l_suppkey")))
                      .alias("n_late_supp")))
    return (
        lo.filter(F.col("is_late") & (F.col("o_orderstatus") == "F"))
        .join(per_order, F.col("l_orderkey") == F.col("agg_okey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


register(QuerySpec(
    "waiting_suppliers", q_waiting_suppliers,
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders      ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                SELECT 1
                FROM lineitem l3 JOIN orders o3
                  ON o3.o_orderkey = l3.l_orderkey
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 shape: double-correlated EXISTS decorrelated into a "
        "per-order aggregate join-back",
    tags=("join", "exists", "anti", "agg", "topk"),
))


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average balance and no *recent*
    orders — a broadcast scalar threshold plus a shuffle anti join on
    custkey, grouped by nation (the fixture has no phone prefix, and
    every fixture customer has at least one lifetime order, so the
    anti join is against orders since 2000 to keep the result
    non-vacuous)."""
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(davg("c_acctbal", "avg_bal")))
    return (
        cust
        .join(orders.filter(F.col("o_orderdate") >= _ts("2000-01-01"))
              .select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"),
             dsum("c_acctbal", "total_acctbal"))
        .orderBy("n_name")
    )


register(QuerySpec(
    "idle_customers", q_idle_customers,
    oracle="""
        SELECT n_name, COUNT(*) AS numcust, {bal}
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT {avg}
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY n_name
        ORDER BY n_name
    """.format(bal=dsum_sql("c_acctbal", "total_acctbal"),
               avg=davg_sql("c_acctbal", "avg_bal")),
    doc="TPC-H Q22 shape: scalar threshold + anti join (customers with "
        "no orders)",
    tags=("anti", "scalar", "agg"),
))
