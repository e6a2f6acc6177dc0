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
    # -- round-17 curation -----------------------------------------------
    # Leads: the three oracle-paired queries that had NEVER had a
    # driver row (registered after the r16 rotation; r16 verdict #1
    # names them as the r17 leads): quality_classifier_train,
    # quality_classifier_eval, split_leakage_semantic.  Then the seven
    # r17-NEW oracle-paired queries (token_decon_apply — the
    # decontaminator under a pinned pre-fitted merge table, the BPE
    # store's benchable apply twin; semdedup_survivors /
    # semdedup_apply — SemDeDup's keep-farthest-from-centroid
    # survivor selection over connected components of the pair graph;
    # semdedup_downweight — its 1/group_size soft twin;
    # blocklist_filter / blocklist_apply / blocklist_terms — the C4
    # badwords gate, word AND phrase token-boundary matches, with the
    # per-term audit).  Then four whose CODE
    # changed this round: token_ngram_decontaminate + bpe_tokenize
    # (tokenizer fitting refactored through word_freqs /
    # learn_bpe_merges_from_freqs / bpe_vocab_from_freqs +
    # token_decon_report, shared with the new store family),
    # bpe_learn_merges (same refactor, the loop itself), and semdedup
    # (pair surface refactored through semdedup_assign /
    # semdedup_pairs_from_assign so the survivor queries reuse one
    # assignment).  quality_classifier_eval's code also changed (the
    # decision sum now accumulates in decimal(38,0), r16 advice) —
    # already leading.  Then the 8 remaining stale-r12 queries in
    # CORRECTNESS_r12.json order, then the stalest 28 of the r13
    # cohort in CORRECTNESS_r13.json order — both cohorts verified
    # programmatically (green in source round, no green since).
    # 3 + 7 + 4 + 8 + 28 = 50.
    #
    # Deferred to the r18 window: the remaining 18 stale-r13 queries
    # in CORRECTNESS_r13.json order (above_nation_avg, cube_orders,
    # date_gallery, filter_project,
    # grouping_sets_sql, longest_doc_per_lang, orders_in_window,
    # orders_no_bulk_item, rank_gallery, scalar_gallery,
    # bpe_token_counts, cosine_topk_ivf, curriculum_deciles,
    # dedup_embedding_cosine, dedup_exact, dedup_incremental,
    # dedup_minhash_lsh, doc_fingerprint), then the stalest of the
    # r14 block (CORRECTNESS_r14.json order).  Lead with
    # r18-new/changed as always.
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # never-driver-checked leads:
    "quality_classifier_train",
    "quality_classifier_eval",
    "split_leakage_semantic",
    # r17-new:
    "token_decon_apply",
    "semdedup_survivors",
    "semdedup_apply",
    "blocklist_filter",
    "blocklist_apply",
    "blocklist_terms",
    "semdedup_downweight",
    # r17-changed:
    "token_ngram_decontaminate",
    "bpe_tokenize",
    "bpe_learn_merges",
    "semdedup",
    # stale-r12 cohort (CORRECTNESS_r12.json order):
    "conditional_pivot",
    "corpus_stats",
    "dedup_containment",
    "dedup_events_first",
    "dedup_exact_survivors",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_source_flow",
    # stale-r13 cohort, first 28 in CORRECTNESS_r13.json order:
    "salted_join_apply",
    "script_mixing_report",
    "ngram_novelty",
    "heavy_hitters",
    "minhash_signatures",
    "dedup_simhash",
    "prune_frequent_tokens",
    "token_length_histogram",
    "chunk_overlap",
    "dedup_winnow_pairs",
    "distinct_users",
    "domain_cap",
    "envelope_project",
    "funnel_conversion",
    "global_topk",
    "json_props",
    "map_functions",
    "multi_resolution_rollup",
    "pivot_event_types",
    "price_percentiles",
    "pricing_summary",
    "range_join_error_after_purchase",
    "running_revenue",
    "session_windows",
    "shipping_priority",
    "similar_part_names",
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
