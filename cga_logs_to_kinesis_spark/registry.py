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
    # -- round-15 curation -----------------------------------------------
    # Leads: the eleven r15-NEW oracle-paired queries
    # (setjoin_prefix — EXACT prefix-filtered set-similarity join;
    # setjoin_incremental — its batch-vs-persisted-corpus form under
    # the incremental-stable fp order;
    # lsh_recall_exact — the banded-minhash surface audited against
    # that full-corpus truth; lsh_recall_curve — the same audit per
    # exact-Jaccard decile band; perplexity_split — CCNet per-language
    # LM tertiles; markup_scrub — HTML tag strip + entity decode;
    # cluster_mixture — temperature weights over k-means topic mass;
    # line_dedup_scrub_rel — the corpus-relative df-share threshold
    # form; line_dedup_pipeline — intra-doc dedup then corpus scrub
    # fitted on the intra-deduped corpus, in one plan;
    # doc_line_profile — per-doc line-structure gating metrics;
    # mixture_apply — deterministic temperature-mixture
    # downsampling, the apply half of mixture_weights), then
    # six whose CODE changed this round — mixture_weights (algebra
    # factored through mixture_weight_columns for the store reader),
    # line_dedup_scrub and line_dedup_intra (cheap_front guard +
    # intra_dedup_frame factoring), boilerplate_ratio_by_source
    # (shares the guarded scrub front), and the two hi-only
    # bucket_bounded callers that gained the explicit NULL-key filter
    # (ann_incremental, dedup_minhash_incremental).  Then the 33
    # stale-r11 queries exactly as the r14 plan deferred them
    # (CORRECTNESS_r11.json order — verified programmatically: green
    # in r11, absent from r12/r13/r14; bigram_surprisal, whose code
    # also changed this round, already sits in this cohort), then the
    # r12 block: fully deferred — the late-round wave displaced its
    # last survivors (shard_assign yielded in the first rotation and
    # leads the r16 stale-r12 pool).  11 + 6 + 33 = 50.
    #
    # Deferred to the r16 window: the remaining 47 stale-r12 queries
    # in CORRECTNESS_r12.json order (shard_assign, salted_join_plan,
    # encoding_anomaly_report, training_order,
    # training_interleave,
    # novelty_curve, cosine_topk_ivf_sq, event_funnel, join_key_skew,
    # sliding_window,
    # small_qty_revenue, split_leakage, split_leakage_repair,
    # split_repair, stats_tumbling, stratified_sample,
    # top3_orders_per_customer, top_supplier, unigram_rarity,
    # volume_shipping, waiting_suppliers, curation_export_manifest,
    # dedup_cluster_stats, dedup_threshold_sweep, forecast_revenue,
    # table_profile, quality_percentile_calibrate, embedding_drift,
    # min_cost_supplier, product_profit, important_stock,
    # supplier_part_counts, excess_stock_suppliers,
    # dedup_best_survivors, dedup_downweight, dedup_components,
    # jsonl_ingest_report, array_functions, asof_last_signup,
    # conditional_pivot, corpus_stats, dedup_containment,
    # dedup_events_first, dedup_exact_survivors, dedup_ngram_jaccard,
    # dedup_simhash_pairs, dedup_source_flow), then the stalest of
    # the r13 window (CORRECTNESS_r13.json order).  Lead with
    # r16-new/changed as always.
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r15-new (late-round additions first):
    "setjoin_prefix",
    "setjoin_incremental",
    "lsh_recall_exact",
    "lsh_recall_curve",
    "perplexity_split",
    "markup_scrub",
    "cluster_mixture",
    "line_dedup_scrub_rel",
    "line_dedup_pipeline",
    "doc_line_profile",
    "mixture_apply",
    # r15-changed (mixture_weights: algebra factored through
    # mixture_weight_columns for the streaming store reader;
    # bigram_surprisal's same-kind refactor is already in-window via
    # the r11 cohort below):
    "mixture_weights",
    "line_dedup_scrub",
    "line_dedup_intra",
    "boilerplate_ratio_by_source",
    "ann_incremental",
    "dedup_minhash_incremental",
    # stale-r11 cohort, exactly as the r14 plan deferred it
    # (CORRECTNESS_r11.json order):
    "token_frequencies",
    "union_by_name",
    "ann_recall_report",
    "ann_truncation_recall",
    "batch_pages",
    "bigram_surprisal",
    "bm25_topk",
    "bpe_learn_merges",
    "bpe_tokenize",
    "char_diversity",
    "cosine_topk",
    "cosine_topk_lsh",
    "customer_distribution",
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
        setjoin,
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
