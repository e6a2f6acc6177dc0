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
    # -- round-8 curation ------------------------------------------------
    # Every r7 window row came back green (49 hash-matched + the
    # by-design no-oracle approx_quantiles, which this round leaves OUT
    # of the window per the r7 advisory — it stays covered by its
    # rank-error-bound test, like approx_distinct_users).  This window
    # executes the rotation planned in the r7 comment: the fourteen
    # r8-new queries first (three from the first half of the round;
    # six added late — forecast_revenue / table_profile /
    # quality_percentile_calibrate / embedding_drift /
    # dedup_best_survivors / dedup_downweight; and the five TPC-H partsupp shapes, NEVER
    # driver-checked before — live now that both engines derive
    # partsupp from part x supplier, see operators/tpch_partsupp.py),
    # then the three whose code changed this round, then the
    # r4-latest cohort (31 of 33 — the stalest greens in the
    # registry; minhash_signatures also ceded its slot, see the
    # inline note), then the r5-latest cohort (2 of 13: date_gallery,
    # rank_gallery, scalar_gallery, cube_orders, filter_project,
    # grouping_sets_sql, longest_doc_per_lang, orders_in_window,
    # above_nation_avg and orders_no_bulk_item ceded their slots to
    # the late-r8 queries — each family keeps an in-window
    # representative (rollup_pricing/unpivot_metrics for grouped
    # aggregation, top3_orders_per_customer for windows,
    # forecast_revenue for pushdown-only scans, min_cost_supplier for
    # correlated subqueries, supplier_part_counts/
    # excess_stock_suppliers for anti/semi chains), and all ten
    # stayed green in this round's full sf0.1 sweep).
    # 14 + 3 + 31 + 2 = 50.
    #
    # Left for the r9 window (stalest after this round): the r6-latest
    # cohort of 49 listed below, PLUS the ten r5-latest queries
    # displaced above (date_gallery, rank_gallery, scalar_gallery,
    # cube_orders, filter_project, grouping_sets_sql,
    # longest_doc_per_lang, orders_in_window, above_nation_avg,
    # orders_no_bulk_item — stalest first), PLUS dedup_simhash (also
    # displaced this round; its family twin dedup_simhash_pairs
    # stayed in-window but simhash itself still needs a fresh row —
    # unlike cosine_topk_fast, whose exclusion is permanent because
    # bit-exact parity tests pin it to cosine_topk).  The r6 cohort:
    # (anti_join_customers, bpe_token_counts, bulk_orders,
    # cosine_topk_ivf, curation_funnel, curation_manifest,
    # curriculum_deciles, date_trunc_buckets, dedup_embedding_cosine,
    # dedup_exact, dedup_incremental, dedup_minhash_lsh,
    # doc_fingerprint, embedding_centroids, embedding_quantize,
    # envelope_json_roundtrip, fertility_by_lang, gopher_quality,
    # gopher_repetition, lang_id, large_volume_customers,
    # multimodal_audio_features, multimodal_raw_features,
    # multimodal_raw_resize, multimodal_video_frames, nation_set_ops,
    # ngram_decontaminate, pack_chunks, pii_scrub, priority_count,
    # promo_share, quality_features, quality_filter_survivors,
    # returned_revenue, revenue_by_nation, segment_totals, semdedup,
    # semi_join_customers, share_of_total, shipmode_priority,
    # snapshot_diff, split_assign, text_normalize, text_stats,
    # tfidf_top_terms, token_frequencies, union_by_name,
    # vocab_coverage, winnowing_fingerprints) — pick the 50 window
    # slots from it plus whatever is new/changed in r9.  Rows-only
    # queries stay out of the window by convention: multimodal_features
    # / multimodal_resize (PNG zlib), approx_distinct_users and
    # approx_quantiles (sketches, error-bound-tested in
    # tests/test_consumer_and_approx.py).
    #
    # new in r8:
    "curation_export_manifest",  # flagship #2: curation through export
    "dedup_cluster_stats",       # cluster-size histogram + yield forecast
    "dedup_threshold_sweep",     # Jaccard histogram per threshold
    "forecast_revenue",          # TPC-H Q6: pushdown-only scan + agg
    "table_profile",             # per-column ingest profile (lineitem)
    "quality_percentile_calibrate",  # per-lang percent_rank gate
    "embedding_drift",           # per-dim snapshot mean drift
    "min_cost_supplier",         # TPC-H Q2: derived partsupp, live
    "product_profit",            # TPC-H Q9
    "important_stock",           # TPC-H Q11
    "supplier_part_counts",      # TPC-H Q16
    "excess_stock_suppliers",    # TPC-H Q20
    "dedup_best_survivors",      # keep-longest near-dup APPLY
    "dedup_downweight",          # soft dedup: weight 1/cluster_size
    # (the two slots come from cosine_topk_fast — bit-exact twin of
    # r7-fresh cosine_topk, pinned by parity tests — and dedup_simhash,
    # whose family keeps dedup_simhash_pairs in-window below)
    # code changed in r8 — fresh rows needed:
    "ann_incremental",           # seen-side ANN_MAX_BUCKET cap (+oracle)
    "dedup_components",          # amortized convergence check
    "jsonl_ingest_report",       # shard_audit_aggs extraction (shared
                                 # with the new streaming twin)
    # r4-latest cohort (31 of 33, the oldest greens in the registry):
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
    "dedup_winnow_pairs",
    "distinct_users",
    "domain_cap",
    "envelope_project",
    "funnel_conversion",
    "global_topk",
    "json_props",
    "map_functions",
    # (minhash_signatures ceded its slot to dedup_downweight: its
    # band signatures are transitively hash-pinned by the EIGHT
    # in-window queries composing minhash_candidates — rotate it
    # back in r9 with the displaced r5 cohort)
    "mixture_weights",
    "multi_resolution_rollup",
    "passage_dedup",
    "pivot_event_types",
    "price_percentiles",
    "pricing_summary",
    "prune_frequent_tokens",
    "range_join_error_after_purchase",
    "running_revenue",
    "session_windows",
    "shipping_priority",
    "similar_part_names",
    "token_length_histogram",
    # r5-latest cohort (2 of 13 — see the rotation note above;
    # orders_no_bulk_item ceded the last slot to dedup_best_survivors,
    # its anti-join-family coverage carried in-window by
    # supplier_part_counts and excess_stock_suppliers — rotate it
    # with the rest of the displaced r5 queries in r9):
    "rollup_pricing",
    "unpivot_metrics",
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
    tpch_partsupp.register_partsupp_suite()
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        ordered[name] = _REGISTRY[name]
    for name in sorted(_REGISTRY):
        ordered.setdefault(name, _REGISTRY[name])
    return ordered
