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
from cga_logs_to_kinesis_spark.operators.dedup import (
    NORMALIZED_SQL,
    exact_dedup_groups,
)
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
            SELECT md5({norm}) AS digest,
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
                           keep=WEIGHTED_KEEP_SQL,
                           norm=NORMALIZED_SQL)


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
               -- COALESCE: an empty sampled stage must agree with the
               -- Spark side's 0.0-padded conditional sum, not NULL.
               COALESCE(
                 (SELECT CAST(SUM(CAST(n_chars AS DECIMAL(38,6)))
                              AS DOUBLE)
                  FROM sampled), 0.0) AS sampled_chars
    """,
    doc="curation funnel: per-stage survivor counts for the composed "
        "pipeline (single-pass conditional aggregates)",
    tags=("llm-pipeline", "north-star", "composition", "agg"),
))


# ---------------------------------------------------------------------------
# Snapshot reconciliation: what changed between two corpus versions
# ---------------------------------------------------------------------------
# The incremental-refresh shape dedup_incremental doesn't cover: a new
# crawl snapshot arrives and ops needs the added / deleted / changed /
# unchanged breakdown before promoting it.  Topology: ONE full outer
# join on doc_id (both sides shuffle on the key — the unavoidable
# exchange), change detection via md5 digests computed scan-side so
# the join carries (id, 16-byte digest), never text.  The fixture has
# one snapshot, so the two versions are derived deterministically
# (drops at doc_id%7==3 in old, at %9==4 in new, edits at %5==0) —
# the derivation IS part of the verified query, so the oracle checks
# the whole reconciliation.

def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(status, n_docs, min/max doc_id) between two (doc_id, text)
    snapshots; digests join, text never shuffles."""
    o = old.select("doc_id", F.md5("text").alias("dig_old"))
    n = new.select("doc_id", F.md5("text").alias("dig_new"))
    status = (F.when(F.col("dig_old").isNull(), "added")
              .when(F.col("dig_new").isNull(), "deleted")
              .when(F.col("dig_old") != F.col("dig_new"), "changed")
              .otherwise("unchanged"))
    return (o.join(n, "doc_id", "full_outer")
            .withColumn("status", status)
            .groupBy("status")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id"))
            .orderBy("status"))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    old = (docs.filter(F.col("doc_id") % 7 != 3)
           .select("doc_id",
                   F.when(F.col("doc_id") % 5 == 0,
                          F.concat(F.col("text"), F.lit(" EDITED")))
                   .otherwise(F.col("text")).alias("text")))
    new = docs.filter(F.col("doc_id") % 9 != 4).select("doc_id", "text")
    return snapshot_diff(old, new)


register(QuerySpec(
    "snapshot_diff", q_snapshot_diff,
    oracle="""
        WITH old AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' EDITED'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 7 <> 3
        ),
        new AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4
        ),
        j AS (
            SELECT doc_id,
                   o.dig AS dig_old, n.dig AS dig_new
            FROM (SELECT doc_id, md5(text) AS dig FROM old) o
            FULL JOIN (SELECT doc_id, md5(text) AS dig FROM new) n
            USING (doc_id)
        )
        SELECT CASE WHEN dig_old IS NULL THEN 'added'
                    WHEN dig_new IS NULL THEN 'deleted'
                    WHEN dig_old <> dig_new THEN 'changed'
                    ELSE 'unchanged' END AS status,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id
        FROM j
        GROUP BY 1 ORDER BY 1
    """,
    doc="corpus snapshot reconciliation: added/deleted/changed/"
        "unchanged via one full outer join of text digests (the "
        "promote-or-rollback gate for a new crawl)",
    tags=("llm-pipeline", "join", "outer", "diff"),
))


# ---------------------------------------------------------------------------
# Flagship composition #2: the COMPLETE training-data path through export
# ---------------------------------------------------------------------------
# ingest → Gopher quality gate → exact dedup → NEAR-dup dedup (the
# full LSH + connected-components front) → hash split → sequence
# packing → export-shard placement, ending in the per (split, source,
# shard) manifest a trainer consumes.  ``curation_manifest`` covers
# the exact-dedup chain; this composition adds the expensive stage a
# real pretraining pipeline cannot skip — near-duplicate collapse —
# and proves the whole path pays each heavy front ONCE:
#
# * the corpus is scanned and quality-gated a single time
#   (localCheckpoint — in production, the staging table a curation run
#   materializes anyway; provision executor-local storage ~1x the
#   gated text volume, same budget note as minhash_candidates);
# * the LSH candidate front (shingle → band → bucket join → exact
#   Jaccard verify) runs once, feeding connected components;
# * everything downstream of the checkpoints is narrow hash math
#   (split/shard assignment) plus ONE window (packing) and ONE final
#   aggregate — tests/test_plans.py asserts the final plan contains no
#   parquet re-scan and no recomputed shingle/minhash expressions.
#
# Near-dups collapse to the component representative (min doc_id), so
# post-dedup split assignment cannot leak a component across splits —
# the composed form of what split_leakage_repair proves pair-by-pair.

def curated_export_corpus(docs: DataFrame) -> DataFrame:
    """documents → fully deduped corpus (+split/+shard/+n_tokens), the
    heavy half of the flagship chain, reusable ahead of any sink."""
    from cga_logs_to_kinesis_spark.operators.dedup import (
        JACCARD_EDGE_THRESHOLD,
        connected_components,
        minhash_candidates,
    )
    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        _ntok,
        _split_of,
    )

    kept = docs.filter(gopher_quality_columns()["keep"]).localCheckpoint()
    reps = (exact_dedup_groups(kept)
            .select(F.col("rep_doc_id").alias("doc_id")))
    exact_surv = kept.join(reps, "doc_id")
    edges = (minhash_candidates(exact_surv)
             .filter(F.col("jaccard") >= JACCARD_EDGE_THRESHOLD)
             .select("doc_a", "doc_b"))
    comp = connected_components(edges).select(
        F.col("doc").alias("doc_id"), F.col("comp").alias("component"))
    final = (exact_surv.join(comp, "doc_id", "left")
             .filter(F.col("component").isNull()
                     | (F.col("component") == F.col("doc_id"))))
    return final.select(
        "doc_id", "source",
        _split_of(F.col("doc_id")).alias("split"),
        shard_column().alias("shard"),
        _ntok().alias("n_tokens"))


def q_curation_export_manifest(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        CHUNK_TOKENS,
    )
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    corpus = curated_export_corpus(docs)
    w = (Window.partitionBy("split", "source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    chunks = (corpus
              .withColumn("cum_before", cum_before)
              .withColumn("first_chunk",
                          (F.col("cum_before") / CHUNK_TOKENS)
                          .cast("long"))
              .withColumn("last_chunk",
                          ((F.col("cum_before") + F.col("n_tokens") - 1)
                           / CHUNK_TOKENS).cast("long")))
    return (chunks
            .groupBy("split", "source", "shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 F.min("first_chunk").alias("first_chunk"),
                 F.max("last_chunk").alias("last_chunk"),
                 F.sum(F.col("last_chunk") - F.col("first_chunk") + 1)
                 .cast("long").alias("n_chunk_rows"))
            .orderBy("split", "source", "shard"))


def _curation_export_oracle() -> str:
    from cga_logs_to_kinesis_spark.operators.dedup import (
        JACCARD_EDGE_THRESHOLD,
        SHINGLES_SQL,
    )
    from cga_logs_to_kinesis_spark.operators.llm_pipeline import (
        CHUNK_TOKENS,
        _split_sql,
    )

    # the LSH body is table-independent past the shingle CTEs; re-root
    # the shingle scan on the exact-dedup survivors
    shingles = SHINGLES_SQL.strip().replace("FROM documents",
                                            "FROM exact_surv")
    from cga_logs_to_kinesis_spark.operators.dedup import (
        MAX_BUCKET,
        N_BANDS,
    )
    return f"""
        WITH RECURSIVE
        gq AS ({_REGISTRY["gopher_quality"].oracle}),
        kept AS (
            SELECT d.* FROM documents d
            JOIN gq ON d.doc_id = gq.doc_id
            WHERE gq.keep
        ),
        groups AS (
            SELECT md5({NORMALIZED_SQL}) AS digest,
                   MIN(doc_id) AS rep
            FROM kept GROUP BY 1
        ),
        exact_surv AS (
            SELECT k.* FROM kept k JOIN groups g ON k.doc_id = g.rep
        ),
        {shingles},
        sigs AS (
            SELECT doc_id, b.band,
                   list_min(list_transform(shingles,
                            s -> md5(b.band || ':' || s))) AS sig
            FROM shingled_ne,
                 (SELECT unnest(range(0, {N_BANDS})) AS band) b
        ),
        banded AS (
            SELECT doc_id, band // 2 AS band2,
                   md5(array_to_string(
                       list_sort(list(band || ':' || sig)), '')) AS sig2
            FROM sigs
            GROUP BY doc_id, band // 2
        ),
        eligible AS (
            SELECT doc_id, band2, sig2 FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band2, sig2) AS bn
                FROM banded
            ) WHERE bn > 1 AND bn <= {MAX_BUCKET}
        ),
        cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM eligible a JOIN eligible b
              ON a.band2 = b.band2 AND a.sig2 = b.sig2
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        edges AS (
            SELECT doc_a, doc_b FROM cand c
            JOIN shingled_ne x ON c.doc_a = x.doc_id
            JOIN shingled_ne y ON c.doc_b = y.doc_id
            WHERE CAST(len(list_intersect(x.shingles, y.shingles))
                       AS DOUBLE)
                  / len(list_distinct(
                        list_concat(x.shingles, y.shingles)))
                  >= {JACCARD_EDGE_THRESHOLD}
        ),
        sym AS (
            SELECT doc_a AS a, doc_b AS b FROM edges
            UNION
            SELECT doc_b, doc_a FROM edges
        ),
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        ),
        comp AS (
            SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
            FROM reach GROUP BY a
        ),
        final AS (
            SELECT s.* FROM exact_surv s
            LEFT JOIN comp c ON s.doc_id = c.doc_id
            WHERE c.component IS NULL OR c.component = s.doc_id
        ),
        toked AS (
            SELECT doc_id, source,
                   {_split_sql("doc_id")} AS split,
                   {_shard_sql()} AS shard,
                   len(regexp_split_to_array(TRIM(text),
                       '[ \\t\\n\\x0B\\f\\r]+')) AS n_tokens
            FROM final
        ),
        cums AS (
            SELECT *,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY split, source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT)
                       AS cum_before
            FROM toked
        )
        SELECT split, source, shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MIN(cum_before // {CHUNK_TOKENS}) AS first_chunk,
               MAX((cum_before + n_tokens - 1) // {CHUNK_TOKENS})
                   AS last_chunk,
               CAST(SUM((cum_before + n_tokens - 1) // {CHUNK_TOKENS}
                        - cum_before // {CHUNK_TOKENS} + 1) AS BIGINT)
                   AS n_chunk_rows
        FROM cums
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """


register(QuerySpec(
    "curation_export_manifest", q_curation_export_manifest,
    oracle=_curation_export_oracle(),
    doc="flagship #2: ingest -> Gopher gate -> exact dedup -> LSH "
        "near-dup components -> hash split -> sequence packing -> "
        "shard placement, as one chain paying each heavy front once; "
        "per (split, source, shard) trainer manifest, hash-verified "
        "against the fully CTE-composed oracle",
    tags=("llm-pipeline", "north-star", "composition", "dedup",
          "split", "export", "sink"),
))
