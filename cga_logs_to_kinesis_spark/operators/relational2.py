"""Relational surface, part 2: time windows (sliding/session),
subquery shapes, grouping sets via SQL, percentiles, array/map
functions, and the TPC-H Q3 top-k join-agg.

Same exactness conventions as relational.py.  Event-time operators
work in integer microseconds (`ts DIV 1000`) on both engines: Spark's
TimestampType is µs-resolution, so µs arithmetic is the common
denominator that DuckDB's ns timestamps can reproduce exactly via
``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cga_logs_to_kinesis_spark.functions.exact import dsum, dsum_sql
from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_events, load_table

_DEC = "decimal(38,6)"


# ---------------------------------------------------------------------------
# Sliding (hopping) window: 10 s length, 5 s slide — every event lands
# in exactly two windows.  Spark's native window() generates the
# overlap; the oracle reproduces it by unnesting the two bucket starts.
# ---------------------------------------------------------------------------

def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev
        .groupBy(F.window("event_time", "10 seconds", "5 seconds"),
                 "event_type")
        .agg(F.count("*").alias("n_events"),
             dsum("value", "sum_value"))
        .select(F.col("window.start").cast("long").alias("window_start_s"),
                "event_type", "n_events", "sum_value")
    )


register(QuerySpec(
    "sliding_window", q_sliding_window,
    oracle="""
        WITH g AS (
            -- ts IS NOT NULL: Spark's window() emits no row for a
            -- NULL timestamp; the oracle must skip them too
            SELECT event_type, value,
                   (epoch_us(ts) // 5000000) AS grid
            FROM events
            WHERE ts IS NOT NULL
        ),
        assigned AS (
            SELECT event_type, value,
                   unnest([grid, grid - 1]) * 5 AS window_start_s
            FROM g
        )
        SELECT window_start_s, event_type,
               COUNT(*) AS n_events,
               {sum_value}
        FROM assigned
        GROUP BY 1, 2
    """.format(sum_value=dsum_sql("value", "sum_value")),
    doc="sliding 10s/5s window aggregation (native window())",
    tags=("agg", "window-time"),
))


# ---------------------------------------------------------------------------
# Session windows: 5-minute inactivity gap per user.  Spark's native
# session_window() merges events <= gap apart (an event exactly AT the
# previous event + gap still extends the session — pinned on dirty
# 5-min-spaced events in tests/test_event_robustness.py); the oracle
# reproduces it with the standard gaps-and-islands construction
# (lag + cumulative sum, new session strictly > gap).  Both in µs.
# ---------------------------------------------------------------------------

GAP_S = 300


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    return (
        ev
        .groupBy(F.session_window("event_time", f"{GAP_S} seconds"),
                 "user_id")
        .agg(F.count("*").alias("n_events"),
             dsum("value", "sum_value"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events", "sum_value")
    )


register(QuerySpec(
    "session_windows", q_session_windows,
    oracle=f"""
        WITH e AS (
            -- ts IS NOT NULL: session_window() drops NULL timestamps
            SELECT user_id, epoch_us(ts) AS us, value FROM events
            WHERE ts IS NOT NULL
        ),
        marked AS (
            SELECT user_id, us, value,
                   CASE WHEN us - LAG(us) OVER w > {GAP_S * 1_000_000}
                        THEN 1 ELSE 0 END AS new_session
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ),
        sessions AS (
            SELECT user_id, us, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        )
        SELECT user_id,
               MIN(us) AS session_start_us,
               MAX(us) + {GAP_S * 1_000_000} AS session_end_us,
               COUNT(*) AS n_events,
               {{sum_value}}
        FROM sessions
        GROUP BY user_id, session_id
    """.format(sum_value=dsum_sql("value", "sum_value")),
    doc="session windows, 5-min gap (native session_window vs islands)",
    tags=("agg", "window-time", "session"),
))


# ---------------------------------------------------------------------------
# Subquery shapes.
# ---------------------------------------------------------------------------

def q_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with account balance above their nation's average —
    the correlated-subquery shape, decorrelated Spark-side into an
    aggregate + broadcast join (what a good optimizer does anyway)."""
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = (cust.groupBy("c_nationkey")
                  .agg((F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                        / F.count("*")).alias("nation_avg")))
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal", "nation_avg")
    )


register(QuerySpec(
    "above_nation_avg", q_above_nation_avg,
    oracle="""
        WITH na AS (
            SELECT c_nationkey,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                       / COUNT(*) AS nation_avg
            FROM customer GROUP BY c_nationkey
        )
        SELECT c_custkey, c_name, c_acctbal, nation_avg
        FROM customer JOIN na USING (c_nationkey)
        WHERE c_acctbal > nation_avg
    """,
    doc="correlated-subquery shape (above per-group average)",
    tags=("join", "subquery", "agg"),
))


def q_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with more than 4 lineitems — EXISTS-with-aggregate."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.count("*").alias("n_items"))
           .filter(F.col("n_items") > 4))
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "n_items")
    )


register(QuerySpec(
    "bulk_orders", q_bulk_orders,
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, n_items
        FROM orders JOIN (
            SELECT l_orderkey, COUNT(*) AS n_items
            FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 4
        ) b ON o_orderkey = b.l_orderkey
    """,
    doc="HAVING-subquery join (orders with >4 lineitems)",
    tags=("join", "subquery", "agg"),
))


def q_orders_no_bulk_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders containing no large-quantity lineitem — an anti join
    that is non-empty at every SF (most orders qualify), unlike the
    structurally identical customer/orders anti join which happens to
    be empty in this fixture."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bulky = li.filter(F.col("l_quantity") >= 48.0).select("l_orderkey")
    return (orders.join(bulky,
                        F.col("o_orderkey") == F.col("l_orderkey"),
                        "left_anti")
            .select("o_orderkey", "o_custkey", "o_totalprice"))


register(QuerySpec(
    "orders_no_bulk_item", q_orders_no_bulk_item,
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_quantity >= 48.0)
    """,
    doc="anti join with guaranteed-nonempty result",
    tags=("join", "anti"),
))


# ---------------------------------------------------------------------------
# SQL surface: GROUPING SETS through spark.sql over temp views.
# ---------------------------------------------------------------------------

def q_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


register(QuerySpec(
    "grouping_sets_sql", q_grouping_sets_sql,
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="explicit GROUPING SETS via the spark.sql surface",
    tags=("agg", "sql", "grouping-sets"),
))


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated): both engines use the same linear-
# interpolation definition; if an engine ever diverges in the last ULP
# the manual window-function construction in git history replaces it.
# ---------------------------------------------------------------------------

def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.lit([0.25, 0.5, 0.75]))
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             pct.getItem(0).alias("p25"),
             pct.getItem(1).alias("p50"),
             pct.getItem(2).alias("p75"),
             F.min("o_totalprice").alias("min_price"),
             F.max("o_totalprice").alias("max_price"))
    )


register(QuerySpec(
    "price_percentiles", q_price_percentiles,
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.50) AS p50,
               quantile_cont(o_totalprice, 0.75) AS p75,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="exact interpolated percentiles per group",
    tags=("agg", "percentile"),
))


# ---------------------------------------------------------------------------
# Array / map functions over parsed JSON.
# ---------------------------------------------------------------------------

def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    k = F.from_json("props", "k INT").getField("k")
    return (
        ev
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             # Arrays are serialized to CSV strings: the driver's pandas
             # canonicalizer cannot sort array-typed cells (same convention
             # as timestamps — emit scalars only).
             F.array_join(
                 F.slice(F.sort_array(F.collect_list("k")), 1, 5), ",")
             .alias("k_smallest5"),
             F.array_join(
                 F.sort_array(
                     F.array_distinct(
                         F.slice(F.sort_array(F.collect_list("k")), 1, 5))),
                 ",").alias("k_smallest5_uniq"),
             F.min("k").alias("k_min"),
             F.max("k").alias("k_max"))
    )


register(QuerySpec(
    "array_functions", q_array_functions,
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               array_to_string(list_sort(list(k))[1:5], ',') AS k_smallest5,
               array_to_string(
                   list_sort(list_distinct(list_sort(list(k))[1:5])), ',')
                   AS k_smallest5_uniq,
               MIN(k) AS k_min,
               MAX(k) AS k_max
        FROM (
            -- json_valid guard: from_json yields NULL on junk JSON
            SELECT event_type,
                   CASE WHEN json_valid(props)
                        THEN CAST(json_extract_string(props, '$.k')
                                  AS INT) END AS k
            FROM events
        )
        GROUP BY event_type
    """,
    doc="from_json struct parse + collect/sort/slice/distinct arrays",
    tags=("scalar", "array", "json", "agg"),
))


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: selective dim filter → fact joins → group → top-k.
# ---------------------------------------------------------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01").cast("timestamp")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.filter(
            F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd")
                 .alias("order_date"))
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


register(QuerySpec(
    "shipping_priority", q_shipping_priority,
    oracle="""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               {revenue}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '1998-06-01'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, order_date
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """.format(revenue=dsum_sql(
        "l_extendedprice * (1 - l_discount)", "revenue")),
    doc="TPC-H Q3 shape: selective filters, 3-way join, top-k",
    tags=("join", "agg", "topk"),
))


# ---------------------------------------------------------------------------
# Envelope JSON round-trip: to_json → from_json through the full
# Envelope wire shape, validating the serialize/deserialize pair (T3)
# against ground truth computed directly from the source rows.
# ---------------------------------------------------------------------------

def q_envelope_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    env = docs.select(
        "doc_id",
        F.to_json(F.struct(
            F.lit("spark-engine").alias("origin"),
            F.lit("LogMessage").alias("event_type"),
            F.struct(
                F.col("text").alias("message"),
                F.lit("OUT").alias("message_type"),
                F.lit("bosh").alias("source_type"),
                F.col("source").alias("source_instance"),
            ).alias("log_message"),
        )).alias("wire"))
    schema = ("origin STRING, event_type STRING, "
              "log_message STRUCT<message: STRING, message_type: STRING, "
              "source_type: STRING, source_instance: STRING>")
    parsed = env.select(
        "doc_id", F.from_json("wire", schema).alias("e"))
    return parsed.select(
        "doc_id",
        F.col("e.origin").alias("origin"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.log_message.source_instance").alias("source_instance"),
        F.length("e.log_message.message").alias("message_len"),
    )


register(QuerySpec(
    "envelope_json_roundtrip", q_envelope_json_roundtrip,
    oracle="""
        SELECT doc_id,
               'spark-engine' AS origin,
               'LogMessage' AS event_type,
               source AS source_instance,
               LENGTH(text) AS message_len
        FROM documents
    """,
    doc="T3 serialize/deserialize round-trip (to_json ∘ from_json = id)",
    tags=("pipeline", "json", "scalar"),
))
