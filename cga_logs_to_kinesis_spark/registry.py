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
    # -- round-12 curation -----------------------------------------------
    # Leads: the six r12-NEW oracle-paired queries (salted_join_plan,
    # encoding_anomaly_report, and the late-r12 ngram_novelty,
    # training_order, training_interleave, novelty_curve), then the
    # four whose CODE
    # CHANGED this round (heavy_hitters: input-width-gated repartition;
    # cosine_topk_ivf_sq: search tail refactored into the shared
    # cosine_topk_from_ivf_index used by the persisted-index serving
    # twin; event_funnel: projection refactored into funnel_feed shared
    # with the streaming state sink; join_key_skew: frequency front
    # refactored into skew_key_frequencies shared with the planner),
    # then the 13 queries deferred from the r11 window (r7-latest
    # green rows), then the 27 stalest of the r8-window cohort in
    # CORRECTNESS_r08.json order (31 originally; dedup_winnow_pairs,
    # distinct_users, domain_cap and envelope_project displaced when
    # the late-r12 ngram_novelty / training_order /
    # training_interleave / novelty_curve took window slots).
    #
    # Deferred to the r13 window (each keeps its r8 green row and
    # full-registry pytest coverage): the remaining 21 of the r8
    # cohort — dedup_winnow_pairs, distinct_users, domain_cap,
    # envelope_project, funnel_conversion, global_topk, json_props,
    # map_functions, mixture_weights, multi_resolution_rollup,
    # passage_dedup, pivot_event_types, price_percentiles,
    # pricing_summary, prune_frequent_tokens,
    # range_join_error_after_purchase, running_revenue,
    # session_windows, shipping_priority, similar_part_names,
    # token_length_histogram, rollup_pricing, unpivot_metrics.  The
    # r13 window should lead with any r13-new/changed queries, then
    # these 23, then the stalest remaining cohort (r9 window, listed
    # in CORRECTNESS_r09.json).
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r12-new:
    "salted_join_plan",
    "encoding_anomaly_report",
    "ngram_novelty",
    "training_order",
    "training_interleave",
    "novelty_curve",
    # r12-changed:
    "heavy_hitters",
    "cosine_topk_ivf_sq",
    "event_funnel",
    "join_key_skew",
    # deferred from the r11 window (r7-latest green rows):
    "shard_assign",
    "sliding_window",
    "small_qty_revenue",
    "split_leakage",
    "split_leakage_repair",
    "split_repair",
    "stats_tumbling",
    "stratified_sample",
    "top3_orders_per_customer",
    "top_supplier",
    "unigram_rarity",
    "volume_shipping",
    "waiting_suppliers",
    # stalest 31 of the r8-window cohort (CORRECTNESS_r08.json order):
    "curation_export_manifest",
    "dedup_cluster_stats",
    "dedup_threshold_sweep",
    "forecast_revenue",
    "table_profile",
    "quality_percentile_calibrate",
    "embedding_drift",
    "min_cost_supplier",
    "product_profit",
    "important_stock",
    "supplier_part_counts",
    "excess_stock_suppliers",
    "dedup_best_survivors",
    "dedup_downweight",
    "ann_incremental",
    "dedup_components",
    "jsonl_ingest_report",
    "array_functions",
    "asof_last_signup",
    "conditional_pivot",
    "corpus_stats",
    "dedup_containment",
    "dedup_events_first",
    "dedup_exact_survivors",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_source_flow",
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
