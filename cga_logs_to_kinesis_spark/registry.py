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
    # -- round-5 curation ------------------------------------------------
    # Every r4 window row came back green (49 hash + pca rows-only), so
    # this round rotates hard: new operators, everything whose code or
    # oracle changed in r5, then the stalest greens (the 24 queries
    # whose last driver row is r1), then the oldest half of the r3
    # cohort.  Left for the r6 window (r3-latest after this round, must
    # rotate then): multimodal_raw_features/_resize, date_trunc_buckets,
    # large_volume_customers, priority_count, promo_share,
    # quality_features, quality_filter_survivors, returned_revenue,
    # share_of_total, shipmode_priority, lang_id, doc_fingerprint,
    # plus r5's rows-only multimodal_audio_features and
    # multimodal_video_frames and the three
    # r3-green row-local ops displaced by the r5 LM-quality trio
    # (pii_scrub, split_assign, stratified_sample).
    #
    # new this round (never driver-checked):
    "volume_shipping",
    "market_share",
    "customer_distribution",
    "top_supplier",
    "small_qty_revenue",
    "disjunctive_revenue",
    "waiting_suppliers",
    "idle_customers",
    "text_normalize",
    "quality_weighted_sample",
    "fertility_by_lang",
    "shard_assign",
    "pagerank_docs",
    "dedup_near_survivors",
    "dedup_recall_report",
    "retention_cohorts",
    "rate_anomaly",
    "curation_manifest",
    "curation_funnel",
    "modal_agreement",
    "dedup_substring",
    "dedup_substring_stats",
    "dedup_substring_apply",
    "bpe_learn_merges",
    "bigram_surprisal",
    "dsir_importance",
    "gopher_quality",
    # changed this round — needs a fresh row:
    "pca_project",           # newly oracle-paired (was the one no_oracle)
    "bm25_topk",             # dl semi-join prune + tokenize-once
    "unigram_rarity",        # tokenize-once localCheckpoint
    "char_diversity",        # core extracted for the streaming twin
    "embedding_covariance",  # oracle extracted for pca reuse
    "multimodal_features",   # real PNG codec (rows-only; last row r1)
    "multimodal_resize",     # real PNG codec (rows-only; last row r1)
    # stale-green refresh: last driver row is r1, four rounds old:
    "above_nation_avg",
    "approx_distinct_users",
    "cube_orders",
    "date_gallery",
    "dedup_simhash",
    "filter_project",
    "grouping_sets_sql",
    "longest_doc_per_lang",
    "orders_in_window",
    "orders_no_bulk_item",
    "rank_gallery",
    "rollup_pricing",
    "scalar_gallery",
    "segment_totals",
    "token_frequencies",
    "unpivot_metrics",
)
# Displaced to make room for the twenty new r5 queries (TPC-H shapes,
# normalization trio, shard_assign, pagerank_docs, the two dedup
# compositions, retention_cohorts, rate_anomaly, the composed
# curation_manifest/funnel, modal_agreement); must rotate into the r6
# window —
# never driver-checked (FIRST priority in r6): snapshot_diff (added
#   after the r5 window was full; green in the pytest sweeps);
# r1-latest (will be 5 rounds stale, also first priority in r6):
#   envelope_json_roundtrip, nation_set_ops, union_by_name,
#   anti_join_customers, semi_join_customers, bulk_orders (the
#   semi/anti/subquery shapes stay driver-covered this round via
#   idle_customers / waiting_suppliers / priority_count /
#   above_nation_avg);
# r3-latest: text_stats, tfidf_top_terms, pack_chunks,
#   gopher_repetition, ngram_decontaminate, curriculum_deciles,
#   embedding_centroids, embedding_quantize, dedup_embedding_cosine,
#   dedup_incremental, semdedup, bpe_token_counts, cosine_topk_ivf,
#   dedup_components (its recursive-CTE machinery is driver-covered
#   this round via dedup_near_survivors).


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
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        ordered[name] = _REGISTRY[name]
    for name in sorted(_REGISTRY):
        ordered.setdefault(name, _REGISTRY[name])
    return ordered
