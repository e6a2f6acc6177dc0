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
    # -- round-16 curation -----------------------------------------------
    # Leads: the four r16-NEW oracle-paired queries
    # (quality_classifier — fastText-style hashing-trick linear
    # keep/drop scorer, integer-exact boundary, map-only apply;
    # quality_classifier_apply — its survivor filter;
    # token_ngram_decontaminate — eval hygiene in BPE token space
    # under the corpus-fitted tokenizer, GPT-3 appendix-C convention;
    # passage_dedup_cdc — content-defined chunk boundaries, the
    # insertion-shift-invariant passage dedup), then seven whose CODE
    # changed this round — bigram_surprisal and perplexity_split (the
    # LM core refactored through surprisal_from_counts: left joins +
    # freq2-derived ctx/vocab for the bigram-count store reader),
    # bpe_tokenize (vocab fitting factored into fit_bpe_vocab, shared
    # with the token decontaminator), ngram_decontaminate (canary
    # seeding factored into the shared decon_canary_seeded /
    # DECON_CANARY_SQL), passage_dedup (dup-decision tail factored
    # into passage_dup_report / PASSAGE_DUP_TAIL_SQL, shared with the
    # CDC chunker), cluster_mixture (expected_epochs renamed
    # budget_per_vec — honest units, r15 advice), and
    # mixture_weights (mixture_weight_columns gained the budget_col
    # parameter that rename rides on).  Then the stale-r12 cohort as
    # the r15 plan deferred it: shard_assign leads (it yielded in the
    # r15 rotation), then the rest in CORRECTNESS_r12.json order —
    # verified programmatically: green in r12, no green driver row in
    # r13/r14/r15.  4 + 7 + 39 = 50.
    #
    # Deferred to the r17 window: the remaining 8 stale-r12 queries
    # in CORRECTNESS_r12.json order (conditional_pivot, corpus_stats,
    # dedup_containment, dedup_events_first, dedup_exact_survivors,
    # dedup_ngram_jaccard, dedup_simhash_pairs, dedup_source_flow),
    # then the stalest of the r13 window (CORRECTNESS_r13.json
    # order).  Lead with r17-new/changed as always.
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r16-new:
    "quality_classifier",
    "quality_classifier_apply",
    "token_ngram_decontaminate",
    "passage_dedup_cdc",
    # r16-changed:
    "bigram_surprisal",
    "perplexity_split",
    "bpe_tokenize",
    "ngram_decontaminate",
    "passage_dedup",
    "cluster_mixture",
    "mixture_weights",
    # stale-r12 cohort (shard_assign promoted per the r15 plan; then
    # CORRECTNESS_r12.json order):
    "shard_assign",
    "salted_join_plan",
    "encoding_anomaly_report",
    "training_order",
    "training_interleave",
    "novelty_curve",
    "cosine_topk_ivf_sq",
    "event_funnel",
    "join_key_skew",
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
    "dedup_components",
    "jsonl_ingest_report",
    "array_functions",
    "asof_last_signup",
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
