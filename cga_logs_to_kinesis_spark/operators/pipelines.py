"""End-to-end corpus curation: the composed pipeline a user actually
runs, as one DataFrame expression.

``curate_corpus`` chains the individual operators the way a
training-data team would — Gopher quality gate → exact dedup
(keep-first) → quality-weighted sampling → export-shard placement —
and the two registered queries are its manifest (per-shard) and
funnel (per-stage counts) views.  Because every stage is a composable
Column/DataFrame builder (``gopher_quality_columns``,
``exact_dedup_groups``, ``weighted_sample_columns``,
``shard_column``), the whole chain stays ONE Catalyst plan: the
quality predicate and sampling predicate both push into the scan
side, the only exchanges are the dedup digest groupBy and the final
shard aggregate, and Catalyst prunes ``text`` the moment the last
text-derived column is computed.  The DuckDB oracle replays the same
chain by CTE composition, so the end-to-end result — not just each
stage — is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.exact import dsum
from cga_logs_to_kinesis_spark.operators.dedup import exact_dedup_groups
from cga_logs_to_kinesis_spark.operators.export import (
    shard_column,
    _shard_sql,
)
from cga_logs_to_kinesis_spark.operators.lm_quality import (
    gopher_quality_columns,
)
from cga_logs_to_kinesis_spark.operators.normalize import (
    WEIGHTED_KEEP_SQL,
    weighted_sample_columns,
)
from cga_logs_to_kinesis_spark.registry import QuerySpec, register, _REGISTRY
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table


def curate_corpus(docs: DataFrame) -> DataFrame:
    """documents → curated documents (+`shard`), the full chain."""
    kept = docs.filter(gopher_quality_columns()["keep"])
    reps = (exact_dedup_groups(kept)
            .select(F.col("rep_doc_id").alias("doc_id")))
    survivors = kept.join(reps, "doc_id")
    sampled = survivors.filter(weighted_sample_columns()["kept"])
    return sampled.withColumn("shard", shard_column())


def q_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest of the curated corpus — what a trainer reads
    to plan shard consumption."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (curate_corpus(docs)
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id"))
            .orderBy("shard"))


_GQ_KEEP = """
        gq AS ({gq}),
        kept AS (
            SELECT d.* FROM documents d
            JOIN gq ON d.doc_id = gq.doc_id
            WHERE gq.keep
        ),
        groups AS (
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ',
                                            'g'))) AS digest,
                   MIN(doc_id) AS rep
            FROM kept GROUP BY 1
        ),
        survivors AS (
            SELECT k.* FROM kept k
            JOIN groups g ON k.doc_id = g.rep
        ),
        sampled AS (
            SELECT * FROM survivors WHERE {keep}
        )"""


def _pipeline_ctes() -> str:
    return _GQ_KEEP.format(gq=_REGISTRY["gopher_quality"].oracle,
                           keep=WEIGHTED_KEEP_SQL)


register(QuerySpec(
    "curation_manifest", q_curation_manifest,
    oracle=f"""
        WITH {_pipeline_ctes()}
        SELECT {_shard_sql()} AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id
        FROM sampled
        GROUP BY 1 ORDER BY 1
    """,
    doc="end-to-end curation (Gopher gate -> exact dedup -> weighted "
        "sample -> shard placement) as one plan; per-shard manifest, "
        "hash-verified against the CTE-composed oracle",
    tags=("llm-pipeline", "north-star", "composition", "sink"),
))


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage survivor counts — the curation funnel report
    (how much each gate removes), one row.  Computed as conditional
    aggregates over ONE pass annotated with all three stage flags, not
    four scans."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.withColumn("_q", gopher_quality_columns()["keep"])
    reps = (exact_dedup_groups(kept.filter("_q"))
            .select(F.col("rep_doc_id").alias("doc_id"),
                    F.lit(True).alias("_rep")))
    staged = (kept.join(reps, "doc_id", "left")
              .withColumn("_s", weighted_sample_columns()["kept"]))
    return staged.agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(F.col("_q"), 1)).alias("n_quality"),
        F.count(F.when(F.col("_q") & F.col("_rep").isNotNull(), 1))
        .alias("n_deduped"),
        F.count(F.when(F.col("_q") & F.col("_rep").isNotNull()
                       & F.col("_s"), 1)).alias("n_sampled"),
        dsum(F.when(F.col("_q") & F.col("_rep").isNotNull()
                    & F.col("_s"), F.col("n_chars"))
             .otherwise(F.lit(0.0)), "sampled_chars"))


register(QuerySpec(
    "curation_funnel", q_curation_funnel,
    oracle=f"""
        WITH {_pipeline_ctes()}
        SELECT (SELECT COUNT(*) FROM documents) AS n_raw,
               (SELECT COUNT(*) FROM kept) AS n_quality,
               (SELECT COUNT(*) FROM survivors) AS n_deduped,
               (SELECT COUNT(*) FROM sampled) AS n_sampled,
               (SELECT CAST(SUM(CAST(n_chars AS DECIMAL(38,6)))
                            AS DOUBLE)
                FROM sampled) AS sampled_chars
    """,
    doc="curation funnel: per-stage survivor counts for the composed "
        "pipeline (single-pass conditional aggregates)",
    tags=("llm-pipeline", "north-star", "composition", "agg"),
))
