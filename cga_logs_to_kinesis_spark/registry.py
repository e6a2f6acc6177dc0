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
    # -- round-11 curation -----------------------------------------------
    # Leads: the three r10-new oracle-paired queries that have never
    # had a driver row (landed after the r10 window was curated;
    # bloom_decontaminate additionally changed this round — nullable-
    # batch fp fix + treeReduce bitmap build), then the r11-new
    # cosine_topk_ivf_sq, then the 11 queries deferred from the r10
    # window (anti_join_customers also CHANGED this round: predicate
    # de-vacuated so sf0.01 produces rows), then 33 of the 46
    # eligible r7-latest queries (the 47-query r7 cohort minus
    # approx_quantiles, which is rows-only and permanently out by
    # convention; alphabetical order, with shard_assign and
    # sliding_window displaced to r12 by the two r11-new slots).
    #
    # Deferred to the r12 window (each keeps its r7 green row and
    # full-registry pytest coverage): shard_assign and sliding_window
    # (displaced when the r11-new join_key_skew and event_funnel took
    # their slots), small_qty_revenue,
    # split_leakage, split_leakage_repair, split_repair,
    # stats_tumbling, stratified_sample, top3_orders_per_customer,
    # top_supplier, unigram_rarity, volume_shipping,
    # waiting_suppliers.  The r12 window should lead with any
    # r12-new/changed queries, then these 13, then the stalest
    # remaining cohort (r8 window, listed in CORRECTNESS_r08.json).
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r10-new, no driver row yet:
    "heavy_hitters",
    "bloom_decontaminate",
    "cosine_topk_pq",
    # r11-new:
    "cosine_topk_ivf_sq",
    "join_key_skew",
    "event_funnel",
    # deferred from the r10 window (r6-latest; anti_join_customers
    # changed in r11):
    "anti_join_customers",
    "bulk_orders",
    "curation_funnel",
    "curation_manifest",
    "date_trunc_buckets",
    "envelope_json_roundtrip",
    "priority_count",
    "promo_share",
    "text_normalize",
    "token_frequencies",
    "union_by_name",
    # oldest 35 of the r7-latest cohort:
    "ann_recall_report",
    "ann_truncation_recall",
    "batch_pages",
    "bigram_surprisal",
    "bm25_topk",
    "bpe_learn_merges",
    "bpe_tokenize",
    "char_diversity",
    "chunk_overlap",
    "cosine_topk",
    "cosine_topk_lsh",
    "customer_distribution",
    "dedup_minhash_incremental",
    "dedup_near_survivors",
    "dedup_recall_report",
    "dedup_substring",
    "dedup_substring_apply",
    "dedup_substring_stats",
    "disjunctive_revenue",
    "dsir_importance",
    "embedding_covariance",
    "embedding_validity",
    "idle_customers",
    "kmeans_embeddings",
    "lang_mismatch_report",
    "length_outliers",
    "market_share",
    "modal_agreement",
    "pagerank_docs",
    "pca_project",
    "quality_weighted_sample",
    "rate_anomaly",
    "retention_cohorts",
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
