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
    # -- round-18 curation -----------------------------------------------
    # Leads: the four r18-NEW oracle-paired queries
    # (semdedup_incremental — batch-vs-persisted-assignment pairs
    # under the fixed centroid artifact, the store-fed SemDeDup form;
    # image_phash / image_dedup_pairs / image_dedup_survivors /
    # image_dedup_incremental — dHash perceptual fingerprints over
    # the planted-scene raw-image fixture, Hamming-banded pairs,
    # keep-first survivors, and the batch-vs-persisted-band-index
    # incremental form).  Then the
    # five whose CODE changed this round: semdedup /
    # semdedup_survivors / semdedup_apply / split_leakage_semantic
    # (assignment refactored through semdedup_centroids +
    # semdedup_assign_with_cents so the incremental form and the
    # store sink share it; oracle CTEs refactored the same way) and
    # semdedup_downweight (the forced member broadcast dropped — r17
    # advice — AQE promotes it when actually small).  Then the 18
    # r17-deferred stale-r13 queries in CORRECTNESS_r13.json order,
    # then the stalest 22 of the r14 block in CORRECTNESS_r14.json
    # order — both cohorts verified programmatically (green in source
    # round, no green since).  5 + 5 + 18 + 22 = 50.
    #
    # Deferred to the r19 window: the remaining 21 stale-r14 queries
    # in CORRECTNESS_r14.json order (segment_totals,
    # semi_join_customers,
    # share_of_total, shipmode_priority, snapshot_diff, split_assign,
    # text_stats, tfidf_top_terms, vocab_coverage,
    # winnowing_fingerprints, bloom_decontaminate, cosine_topk_pq,
    # anti_join_customers, bulk_orders, curation_funnel,
    # curation_manifest, date_trunc_buckets, envelope_json_roundtrip,
    # priority_count, promo_share, text_normalize), then the stalest
    # of the r15 block (CORRECTNESS_r15.json order).  Lead with
    # r19-new/changed as always.
    # Permanently out by convention (unchanged, still holds):
    # cosine_topk_fast (bit-exact parity-pinned to cosine_topk by
    # tests/test_similarity_fast.py) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r18-new:
    "semdedup_incremental",
    "image_phash",
    "image_dedup_pairs",
    "image_dedup_survivors",
    "image_dedup_incremental",
    # r18-changed:
    "semdedup",
    "semdedup_survivors",
    "semdedup_apply",
    "split_leakage_semantic",
    "semdedup_downweight",
    # stale-r13 cohort, remaining 18 in CORRECTNESS_r13.json order:
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
    # stale-r14 cohort, first 22 in CORRECTNESS_r14.json order:
    "boilerplate_lines",
    "source_divergence",
    "corpus_drift",
    "homoglyph_scrub",
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
    "pack_chunks",
    "pii_scrub",
    "quality_features",
    "quality_filter_survivors",
    "returned_revenue",
    "revenue_by_nation",
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
