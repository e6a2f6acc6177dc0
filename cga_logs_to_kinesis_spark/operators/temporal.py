"""Temporal join operators: as-of join and bucketed range join.

Spark has no native ASOF JOIN.  The classic distributed construction
used here avoids any join at all for the as-of case: union both sides,
sort within (key) by time, and carry the right side's latest value
forward with a running ``last(ignorenulls)`` window.  One shuffle on
the key, no row explosion, no range-condition nested loop — this is
the formulation that survives 100 TB, unlike a theta-join which Spark
would execute as a broadcast nested loop.

The range join uses time-bucket blocking: candidates must share a
bucket (or be in adjacent buckets), turning an inequality join into an
equi-join on (key, bucket) plus a residual filter — same trick as the
LSH blocking in dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_events


def asof_join_last_event(events: DataFrame, left_type: str,
                         right_type: str) -> DataFrame:
    """For each `left_type` event: the most recent prior-or-equal
    `right_type` event's (ts, event_id) for the same user.

    Implementation: union-sort-carry.  Right rows contribute their
    payload; a window ``last(payload, ignorenulls=True)`` ordered by
    (ts, is_left, event_id) makes each left row see the latest right
    row at-or-before it.  Right rows sort before left rows at equal
    ts, so ties are inclusive (ASOF <=) — matching DuckDB's ASOF JOIN.
    """
    events = events.withColumn("us", F.expr("ts DIV 1000"))
    left = (events.filter(F.col("event_type") == left_type)
            .select("user_id", "us", "event_id", "value")
            .withColumn("is_left", F.lit(1))
            .withColumn("right_us", F.lit(None).cast("long"))
            .withColumn("right_id", F.lit(None).cast("long")))
    right = (events.filter(F.col("event_type") == right_type)
             .select("user_id", "us", "event_id",
                     F.lit(None).cast("double").alias("value"))
             .withColumn("is_left", F.lit(0))
             .withColumn("right_us", F.col("us"))
             .withColumn("right_id", F.col("event_id")))
    merged = left.unionByName(right)
    w = (Window.partitionBy("user_id")
         .orderBy("us", "is_left", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (merged
               .withColumn("asof_us",
                           F.last("right_us", ignorenulls=True).over(w))
               .withColumn("asof_id",
                           F.last("right_id", ignorenulls=True).over(w)))
    # microseconds everywhere: TimestampType (and DuckDB's parquet
    # reader for ns timestamps) is us-resolution, so us is the finest
    # cross-engine-exact time unit
    return (carried.filter(F.col("is_left") == 1)
            .select("user_id",
                    F.col("event_id").alias("purchase_id"),
                    F.col("us").alias("purchase_us"),
                    F.col("asof_id").alias("last_signup_id"),
                    F.col("asof_us").alias("last_signup_us"),
                    (F.col("us") - F.col("asof_us")).alias("lag_us")))


def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    out = asof_join_last_event(ev, "purchase", "signup")
    # NULL-free output: unmatched purchases (no prior signup) carry a -1
    # sentinel so the cross-engine compare never hits pandas'
    # nullable-int64→float64 coercion on the oracle side.
    return out.fillna(
        -1, subset=["last_signup_id", "last_signup_us", "lag_us"])


register(QuerySpec(
    "asof_last_signup", q_asof_last_signup,
    oracle="""
        WITH p AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'purchase'),
             s AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'signup')
        SELECT p.user_id,
               p.event_id AS purchase_id,
               epoch_us(p.ts) AS purchase_us,
               COALESCE(s.event_id, -1) AS last_signup_id,
               COALESCE(epoch_us(s.ts), -1) AS last_signup_us,
               COALESCE(epoch_us(p.ts) - epoch_us(s.ts), -1) AS lag_us
        FROM p ASOF LEFT JOIN s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="as-of join via union-sort-carry (no nested-loop range join)",
    tags=("join", "asof", "window"),
))


BUCKET_US = 3600 * 1_000_000   # 1 h blocking buckets


def q_range_join_error_after_purchase(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Error events within 1 h AFTER a purchase by the same user —
    an interval join, bucketed so it never degenerates into a
    nested-loop cross product: a match within 1 h lies in the same or
    the next 1 h bucket, so the join key is (user_id, bucket) with a
    residual range filter."""
    tune_session(spark)
    ev = load_events(spark, sf_dir)
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id"),
                 F.col("event_id").alias("purchase_id"),
                 F.expr("ts DIV 1000").alias("p_us")))
    e = (ev.filter(F.col("event_type") == "error")
         .select(F.col("user_id").alias("e_user"),
                 F.col("event_id").alias("error_id"),
                 F.expr("ts DIV 1000").alias("e_us")))
    p2 = p.withColumn(
        "bucket", F.explode(F.array(
            F.expr(f"p_us DIV {BUCKET_US}"),
            F.expr(f"p_us DIV {BUCKET_US} + 1"))))
    e2 = e.withColumn("bucket", F.expr(f"e_us DIV {BUCKET_US}"))
    return (
        p2.join(e2, (p2.user_id == e2.e_user)
                & (p2.bucket == e2.bucket))
        .filter((F.col("e_us") > F.col("p_us"))
                & (F.col("e_us") - F.col("p_us") <= BUCKET_US))
        .select("user_id", "purchase_id", "error_id",
                (F.col("e_us") - F.col("p_us")).alias("delay_us"))
    )


register(QuerySpec(
    "range_join_error_after_purchase", q_range_join_error_after_purchase,
    oracle=f"""
        SELECT p.user_id,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               epoch_us(e.ts) - epoch_us(p.ts) AS delay_us
        FROM events p JOIN events e
          ON p.user_id = e.user_id
         AND p.event_type = 'purchase' AND e.event_type = 'error'
         AND epoch_us(e.ts) > epoch_us(p.ts)
         AND epoch_us(e.ts) - epoch_us(p.ts) <= {BUCKET_US}
    """,
    doc="bucketed interval join (equi-join on time block + residual)",
    tags=("join", "range"),
))
