"""Similarity search over the embeddings table.

Brute-force cosine top-k is the correctness baseline: query set ×
corpus, dot products as higher-order array expressions (JVM codegen,
no Python), top-k via per-group window.  At 100 TB the same topology
holds with a broadcast query set — the corpus never shuffles; each
scan partition scores its rows and the only wide operation is the
per-query top-k reduction.

Exactness: a float dot product is order-dependent in IEEE double, so
each elementwise product (exact in double — 24-bit×24-bit mantissas fit
in 53) is cast to DECIMAL(38,20) and summed exactly.  Spark and DuckDB
then agree bit-for-bit, which makes ANN-vs-exact recall measurable, not
guessable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table

# Summation order contract: Spark's `aggregate` and DuckDB's
# `list_reduce` both fold strictly left-to-right, so a plain double
# accumulator produces bit-identical IEEE results in both engines.
# (Decimal accumulation is NOT portable here: Spark casts double →
# decimal via the shortest string representation while DuckDB uses the
# exact binary value, so the 20th decimal digit diverges.)
def _seq_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def exact_dot(a: str, b: str) -> Column:
    """Sequential-order dot product of two float array columns."""
    prods = F.zip_with(
        F.col(a), F.col(b),
        lambda x, y: x.cast("double") * y.cast("double"))
    return _seq_sum(prods)


def exact_norm(a: str) -> Column:
    sq = F.transform(F.col(a),
                     lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_seq_sum(sq))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Exact cosine top-k of `queries` (vec_id, embedding) vs `emb`."""
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("ce"))
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id",
            (exact_dot("qe", "ce")
             / (exact_norm("qe") * exact_norm("ce"))).alias("cosine"))
    )
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("cosine").desc(), F.col("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine", "rank"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, queries, k=5)


register(QuerySpec(
    "cosine_topk", q_cosine_topk,
    oracle="""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
        -- list_reduce folds left-to-right, matching Spark's aggregate()
        dots AS (
            SELECT query_id, cand_id,
                   0.0 + list_reduce(
                       list_transform(list_zip(qe, ce),
                           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                       (acc, x) -> acc + x) AS dot
            FROM q CROSS JOIN c
            WHERE cand_id != query_id
        ),
        norms AS (
            SELECT vec_id,
                   SQRT(list_reduce(
                       list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (acc, x) -> acc + x)) AS nrm
            FROM embeddings
        )
        SELECT query_id, cand_id, cosine, rank FROM (
            SELECT d.query_id, d.cand_id,
                   d.dot / (nq.nrm * nc.nrm) AS cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.query_id
                       ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.cand_id
                   ) AS rank
            FROM dots d
            JOIN norms nq ON d.query_id = nq.vec_id
            JOIN norms nc ON d.cand_id = nc.vec_id
        ) WHERE rank <= 5
    """,
    doc="brute-force exact cosine top-k (broadcast query set)",
    tags=("similarity", "north-star"),
))
