"""Query registry: every engine operator, bound to its DuckDB oracle.

Each :class:`QuerySpec` carries a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (when the semantics are ANSI-SQL-expressible) the
equivalent DuckDB SQL over the fixture views.  The driver contract
(``__spark_entry__.py``) and the local checker (``tools/check.py``)
both consume this registry, so adding an operator in one place wires it
into smoke, correctness, and bench.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None            # None → non-SQL-expressible (rows-only)
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


# The driver's correctness harness verifies only the FIRST 50 entries of
# queries() (insertion order).  This list curates that window each round:
# queries with no prior green driver row come first, then one
# representative per operator family so regressions in reworked code
# (e.g. the round-2 LSH rewrite) stay driver-visible.  Queries rotated
# out keep their green rows from earlier CORRECTNESS_r*.json and remain
# covered by tests/test_queries_oracle.py over the full registry.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- round-14 curation -----------------------------------------------
    # Leads: the five r14-NEW oracle-paired queries (the line-level
    # boilerplate dedup family — boilerplate_lines report,
    # line_dedup_scrub apply, boilerplate_ratio_by_source gate,
    # line_dedup_intra within-doc half — plus source_divergence, the
    # integer-exact per-source total-variation audit), then
    # four whose CODE changed this round — corpus_drift (per-doc
    # projection factored into drift_per_doc for the streaming twin),
    # homoglyph_scrub (scrub factored into confusable_scrub_columns),
    # and the two hi-only bucket_bounded callers whose cap became a
    # LEFT ANTI join against the over-cap bucket list
    # (ann_incremental, dedup_minhash_incremental).  Then the 30
    # remaining r10-cohort queries (CORRECTNESS_r10.json order), then
    # the 11 stalest of the r11 cohort (CORRECTNESS_r11.json order;
    # latest green r11 — not re-checked in r12 or r13).
    # 5 + 4 + 30 + 11 = 50.
    #
    # Deferred to the r15 window: the remaining 33 stale-r11 queries
    # in CORRECTNESS_r11.json order (token_frequencies, union_by_name,
    # ann_recall_report,
    # ann_truncation_recall, batch_pages, bigram_surprisal, bm25_topk,
    # bpe_learn_merges, bpe_tokenize, char_diversity, cosine_topk,
    # cosine_topk_lsh, customer_distribution, dedup_near_survivors,
    # dedup_recall_report, dedup_substring, dedup_substring_apply,
    # dedup_substring_stats, disjunctive_revenue, dsir_importance,
    # embedding_covariance, embedding_validity, idle_customers,
    # kmeans_embeddings, lang_mismatch_report, length_outliers,
    # market_share, modal_agreement, pagerank_docs, pca_project,
    # quality_weighted_sample, rate_anomaly, retention_cohorts),
    # then the stalest of the r12 window (CORRECTNESS_r12.json
    # order).  Lead with r15-new/changed as always.
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r14-new:
    "boilerplate_lines",
    "line_dedup_scrub",
    "boilerplate_ratio_by_source",
    "source_divergence",
    "line_dedup_intra",
    # r14-changed:
    "corpus_drift",
    "homoglyph_scrub",
    "ann_incremental",
    "dedup_minhash_incremental",
    # r10 cohort, latest green r10 (CORRECTNESS_r10.json order):
    "embedding_centroids",
    "embedding_quantize",
    "fertility_by_lang",
    "gopher_quality",
    "gopher_repetition",
    "lang_id",
    "large_volume_customers",
    "multimodal_audio_features",
    "multimodal_raw_features",
    "multimodal_raw_resize",
    "multimodal_video_frames",
    "nation_set_ops",
    "ngram_decontaminate",
    "pack_chunks",
    "pii_scrub",
    "quality_features",
    "quality_filter_survivors",
    "returned_revenue",
    "revenue_by_nation",
    "segment_totals",
    "semdedup",
    "semi_join_customers",
    "share_of_total",
    "shipmode_priority",
    "snapshot_diff",
    "split_assign",
    "text_stats",
    "tfidf_top_terms",
    "vocab_coverage",
    "winnowing_fingerprints",
    # stalest r11 cohort (CORRECTNESS_r11.json order):
    "bloom_decontaminate",
    "cosine_topk_pq",
    "anti_join_customers",
    "bulk_orders",
    "curation_funnel",
    "curation_manifest",
    "date_trunc_buckets",
    "envelope_json_roundtrip",
    "priority_count",
    "promo_share",
    "text_normalize",
)


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side-effect: registration).

    Returns the registry ordered for the driver contract: the curated
    :data:`DRIVER_WINDOW` first (the driver checks only the first 50
    entries), then every remaining query alphabetically.
    """
    from cga_logs_to_kinesis_spark.operators import (  # noqa: F401
        bpe,
        clustering,
        corpus_quality,
        dedup,
        export,
        graph,
        ingest_audit,
        line_dedup,
        llm_pipeline,
        lm_quality,
        multimodal,
        normalize,
        pipeline_ops,
        pipelines,
        relational,
        relational2,
        relational3,
        similarity,
        sketches,
        temporal,
        text,
        tpch_shapes,
        tpch_shapes2,
    )
    from cga_logs_to_kinesis_spark.operators import tpch_partsupp
    tpch_partsupp.register_partsupp_suite()
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        ordered[name] = _REGISTRY[name]
    for name in sorted(_REGISTRY):
        ordered.setdefault(name, _REGISTRY[name])
    return ordered
