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
    # -- round-7 curation ------------------------------------------------
    # Every r6 window row came back green (all 50 hash-matched), so this
    # round executes the rotation planned in the r6 comment:
    # never-driver-checked first (the r6-late quartet plus bpe_tokenize,
    # which had slipped through every earlier window, plus the queries
    # new in r7), then the r3-stale straggler, then the full r5-stale
    # cohort, then code-changed queries, then the oldest r4-stale
    # representatives.  Left for the r8 window (r4-latest after this
    # round): array_functions, asof_last_signup, conditional_pivot,
    # corpus_stats, dedup_containment, dedup_events_first,
    # dedup_exact_survivors, dedup_ngram_jaccard, dedup_simhash_pairs,
    # dedup_source_flow, dedup_winnow_pairs, distinct_users, domain_cap,
    # envelope_project, funnel_conversion, global_topk, json_props,
    # map_functions, mixture_weights, multi_resolution_rollup,
    # pivot_event_types, price_percentiles, prune_frequent_tokens,
    # range_join_error_after_purchase, shipping_priority,
    # similar_part_names, token_length_histogram; then the r5-latest
    # leftovers (above_nation_avg, cube_orders, date_gallery,
    # dedup_simhash, filter_project, grouping_sets_sql,
    # longest_doc_per_lang, orders_in_window, orders_no_bulk_item,
    # rank_gallery, rollup_pricing, scalar_gallery, unpivot_metrics)
    # plus rows-only multimodal_features / multimodal_resize (PNG zlib:
    # genuinely non-SQL) and approx_distinct_users (sketch:
    # error-bound-tested instead, tests/test_consumer_and_approx.py).
    #
    # never driver-checked (r6-late additions + r7-new):
    "embedding_validity",
    "dedup_minhash_incremental",
    "split_leakage",
    "split_repair",
    "bpe_tokenize",
    "jsonl_ingest_report",       # new in r7
    "split_leakage_repair",      # new in r7 (composed leak->repair)
    "lang_mismatch_report",      # new in r7 (label-noise audit)
    "length_outliers",           # new in r7 (median/MAD robust gate)
    "approx_quantiles",          # new in r7 (rows-only, rank-bounded)
    "chunk_overlap",             # new in r7 (RAG sliding windows)
    "ann_truncation_recall",     # new in r7 (MRL prefix fidelity)
    "ann_incremental",           # new in r7 (persisted-index ANN)
    # r3-latest straggler:
    "stratified_sample",
    # r5-latest cohort (the rotation promised in the r6 comment):
    "volume_shipping",
    "market_share",
    "customer_distribution",
    "top_supplier",
    "small_qty_revenue",
    "disjunctive_revenue",
    "waiting_suppliers",
    "idle_customers",
    "shard_assign",
    "pagerank_docs",
    "dedup_near_survivors",      # also composes the r7 components rewrite
    "dedup_recall_report",
    "retention_cohorts",
    "rate_anomaly",
    "modal_agreement",
    "dedup_substring",
    "dedup_substring_stats",
    "dedup_substring_apply",
    "bpe_learn_merges",
    "bigram_surprisal",
    "dsir_importance",
    "pca_project",
    "bm25_topk",
    "unigram_rarity",
    "char_diversity",
    "embedding_covariance",
    "quality_weighted_sample",
    # code changed in r7 — needs a fresh row:
    "dedup_components",          # pointer-doubling components rewrite
    # r4-latest cohort, oldest first (embedding oracles also gained the
    # VALID_EMBEDDING_SQL gate twin in r7 — fresh rows for that family).
    # Displaced to r8 by the four r7-new queries above:
    # cosine_topk_fast (bit-exact twin of cosine_topk, which stays),
    # passage_dedup, running_revenue, pricing_summary (headline-benched
    # and plan-pinned every round), minhash_signatures (the LSH family
    # keeps dedup_minhash_lsh r6-green + cosine_topk_lsh in-window),
    # session_windows (the window family keeps sliding_window +
    # stats_tumbling in-window).
    "ann_recall_report",
    "cosine_topk",
    "cosine_topk_lsh",
    "kmeans_embeddings",
    "batch_pages",
    "stats_tumbling",
    "sliding_window",
    "top3_orders_per_customer",
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
        temporal,
        text,
        tpch_shapes,
        tpch_shapes2,
    )
    from cga_logs_to_kinesis_spark.operators import tpch_partsupp
    tpch_partsupp.register_when_fixture_ships()
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        ordered[name] = _REGISTRY[name]
    for name in sorted(_REGISTRY):
        ordered.setdefault(name, _REGISTRY[name])
    return ordered
