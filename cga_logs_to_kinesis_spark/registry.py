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
    # -- round-13 curation -----------------------------------------------
    # Leads: the four r13-NEW oracle-paired queries
    # (salted_join_apply: the applied skew mitigation, hash-checked
    # against the unsalted join; script_mixing_report: the
    # homoglyph-spam audit; corpus_drift: the ingest-order
    # distribution monitor; homoglyph_scrub: the confusable repair),
    # then seven whose CODE changed this
    # round — ngram_novelty
    # (first-occurrence fold reshaped from WindowExec-over-fp to the
    # skew-safe groupBy-min), heavy_hitters (width gate refactored
    # into session.widen_for_explode), and one representative per
    # newly-gated explode front: minhash_signatures (shingle_docs),
    # dedup_simhash (simhash tokenize), prune_frequent_tokens
    # (distinct-token front), token_length_histogram (text tokenize),
    # chunk_overlap (chunk spread).  Then the 21 stalest-cohort
    # queries whose latest green row is r9 (CORRECTNESS_r09.json
    # order; prune_frequent_tokens and token_length_histogram from
    # that cohort already sit in the changed block, closing out all
    # 23), then 18 of the r10 cohort in CORRECTNESS_r10.json order
    # (minhash_signatures / dedup_simhash from it likewise already
    # placed).  4 + 7 + 21 + 18 = 50.
    #
    # Deferred to the r14 window: the remaining 30 of the r10 cohort
    # in CORRECTNESS_r10.json order (embedding_centroids,
    # embedding_quantize,
    # fertility_by_lang, gopher_quality, gopher_repetition, lang_id,
    # large_volume_customers, multimodal_audio_features,
    # multimodal_raw_features, multimodal_raw_resize,
    # multimodal_video_frames, nation_set_ops, ngram_decontaminate,
    # pack_chunks, pii_scrub, quality_features,
    # quality_filter_survivors, returned_revenue, revenue_by_nation,
    # segment_totals, semdedup, semi_join_customers, share_of_total,
    # shipmode_priority, snapshot_diff, split_assign, text_stats,
    # tfidf_top_terms, vocab_coverage, winnowing_fingerprints — 29,
    # take what fits), then the stalest of the r11 window
    # (CORRECTNESS_r11.json order).  Lead with r14-new/changed as
    # always.
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r13-new:
    "salted_join_apply",
    "script_mixing_report",
    "corpus_drift",
    "homoglyph_scrub",
    # r13-changed:
    "ngram_novelty",
    "heavy_hitters",
    "minhash_signatures",
    "dedup_simhash",
    "prune_frequent_tokens",
    "token_length_histogram",
    "chunk_overlap",
    # stalest cohort, latest green r9 (CORRECTNESS_r09.json order):
    "dedup_winnow_pairs",
    "distinct_users",
    "domain_cap",
    "envelope_project",
    "funnel_conversion",
    "global_topk",
    "json_props",
    "map_functions",
    "mixture_weights",
    "multi_resolution_rollup",
    "passage_dedup",
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
    # r10 cohort (CORRECTNESS_r10.json order, two placed above):
    "above_nation_avg",
    "cube_orders",
    "date_gallery",
    "filter_project",
    "grouping_sets_sql",
    "longest_doc_per_lang",
    "orders_in_window",
    "orders_no_bulk_item",
    "rank_gallery",
    "scalar_gallery",
    "bpe_token_counts",
    "cosine_topk_ivf",
    "curriculum_deciles",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "doc_fingerprint",
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
