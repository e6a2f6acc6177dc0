"""The reference pipeline's transforms, re-expressed as batch queries.

The streaming pipeline itself lives in ``streaming/``; these queries
expose its two core semantics — the Envelope projection (T1) and the
key-partitioned ≤500-record batch cut (B2) — as oracle-checkable batch
relations so the correctness gate covers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table
from cga_logs_to_kinesis_spark.streaming.envelope import (
    MAX_BATCH_SIZE,
    SOURCE_TYPE,
)


def q_envelope_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: line → Envelope fields (reference main.go:330-347).

    The documents fixture stands in for tailed log lines: ``text`` is
    the line, ``source`` the watched file path (= partition key,
    reference main.go:346).  Constants per reference main.go:324-328:
    message_type always OUT, source_type "bosh", event_type LogMessage.
    Pure narrow projection — no shuffle at any scale.
    """
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.lit("spark-engine").alias("origin"),
        F.lit("LogMessage").alias("event_type"),
        F.lit("OUT").alias("message_type"),
        F.lit(SOURCE_TYPE).alias("source_type"),
        F.col("source").alias("source_instance"),
        F.col("text").alias("message"),
        F.length("text").alias("message_len"),
        F.col("source").alias("partition_key"),
        F.col("doc_id").alias("line_id"),
    )


register(QuerySpec(
    "envelope_project", q_envelope_project,
    oracle="""
        SELECT 'spark-engine' AS origin,
               'LogMessage' AS event_type,
               'OUT' AS message_type,
               'bosh' AS source_type,
               source AS source_instance,
               text AS message,
               LENGTH(text) AS message_len,
               source AS partition_key,
               doc_id AS line_id
        FROM documents
    """,
    doc="T1 envelope projection (reference main.go:330-347)",
    tags=("pipeline", "project"),
))


def q_batch_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: cut each partition key's stream into ≤500-record pages.

    Reference semantics: the batchproducer slices its buffer into
    batches of at most MaxKinesisBatchSize=500 records (reference
    batchproducer.go:14,242-259), keyed by partition key
    (main.go:346).  Here lineitem stands in: key = l_suppkey, arrival
    order = (l_orderkey, l_linenumber).  Output is one row per page
    with its size — every page ≤500 and only the last page per key
    short, which the oracle verifies structurally.
    """
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return (
        li
        .withColumn("seq", F.row_number().over(w))
        .withColumn("page_id",
                    ((F.col("seq") - 1) / MAX_BATCH_SIZE).cast("long"))
        .groupBy(F.col("l_suppkey").alias("partition_key"), "page_id")
        .agg(F.count("*").alias("page_records"),
             F.min("seq").alias("first_seq"),
             F.max("seq").alias("last_seq"))
    )


register(QuerySpec(
    "batch_pages", q_batch_pages,
    oracle=f"""
        SELECT l_suppkey AS partition_key,
               (seq - 1) // {MAX_BATCH_SIZE} AS page_id,
               COUNT(*) AS page_records,
               MIN(seq) AS first_seq,
               MAX(seq) AS last_seq
        FROM (
            SELECT l_suppkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_orderkey, l_linenumber
                   ) AS seq
            FROM lineitem
        )
        GROUP BY 1, 2
    """,
    doc="B2 batch cut into ≤500-record pages (reference batchproducer.go:14)",
    tags=("pipeline", "window", "agg"),
))
