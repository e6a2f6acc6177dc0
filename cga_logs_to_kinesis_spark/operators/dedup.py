"""Deduplication operators over the documents table.

Training-data pipelines dedup at three strengths; all are expressed
Spark-first so they scale by partitioning, not by driver memory:

- exact: hash-groupBy on a normalized text digest.  One shuffle on the
  digest; at 100 TB the digest (16 bytes) shuffles, never the text.
- near-dup (MinHash + LSH, SimHash, n-gram Jaccard): candidate
  generation via banding so the cross product never materializes.
- embedding cosine near-dup lives in similarity.py.

Hash choice: md5 — not for speed but because Spark and DuckDB produce
the identical digest, which makes every stage oracle-checkable.  The
non-oracle production path can swap xxhash64 via the `hash_expr`
parameter without touching the topology.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table


def normalized_text(col: str = "text") -> Column:
    """Whitespace-collapsed, lowercased text: the dedup canonical form."""
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


NORMALIZED_SQL = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """digest → (representative doc_id, duplicate count).

    Only (digest, doc_id) shuffle; representative = min doc_id, the
    standard deterministic keep-first policy.
    """
    return (
        docs
        .select(F.md5(normalized_text()).alias("text_digest"), "doc_id")
        .groupBy("text_digest")
        .agg(F.min("doc_id").alias("rep_doc_id"),
             F.count("*").alias("n_dups"))
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


register(QuerySpec(
    "dedup_exact", q_dedup_exact,
    oracle=f"""
        SELECT md5({NORMALIZED_SQL}) AS text_digest,
               MIN(doc_id) AS rep_doc_id,
               COUNT(*) AS n_dups
        FROM documents
        GROUP BY 1
    """,
    doc="exact dedup: hash-groupBy on normalized-text digest",
    tags=("dedup", "north-star"),
))


def q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself: first doc per digest, with text."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    reps = exact_dedup_groups(docs).select(
        F.col("rep_doc_id").alias("doc_id"), "n_dups")
    return (
        docs.join(reps, "doc_id")
        .select("doc_id", "source", "lang", "n_dups")
    )


register(QuerySpec(
    "dedup_exact_survivors", q_dedup_exact_survivors,
    oracle=f"""
        WITH groups AS (
            SELECT md5({NORMALIZED_SQL}) AS text_digest,
                   MIN(doc_id) AS rep_doc_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY 1
        )
        SELECT d.doc_id, d.source, d.lang, g.n_dups
        FROM documents d JOIN groups g ON d.doc_id = g.rep_doc_id
    """,
    doc="exact-dedup survivor set (keep-first policy)",
    tags=("dedup", "north-star"),
))
