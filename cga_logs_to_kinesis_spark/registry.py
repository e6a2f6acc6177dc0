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
    # -- round-10 curation -----------------------------------------------
    # Round 9 was cut short (17 turns) and never rotated this window, so
    # the driver re-checked the r8 window verbatim: all 50 r8-window
    # queries now carry r9-green rows, and the stale cohorts the r8
    # comment queued for r9 are STILL the stalest greens in the
    # registry.  This window executes that queued rotation, stalest
    # first.  No registry query's code changed in r9 or so far in r10
    # (the r9/early-r10 changes were compact_label_store keep-two +
    # its tests, streaming-only), so the window is pure staleness
    # rotation:
    #   1 x r4-latest: minhash_signatures (the stalest green anywhere;
    #     its band signatures are transitively pinned by the in-window
    #     minhash_candidates consumers, but it has had no direct row
    #     since r4);
    #   11 x r5-latest: the ten queries displaced from the r8 window
    #     plus dedup_simhash (its pairs twin carried the family in r8);
    #   38 x r6-latest: the r6 cohort of 49 minus the 11 deferred below.
    # 1 + 11 + 38 = 50.
    #
    # Deferred to the r11 window (each has an in-window family
    # representative carrying coverage this round, and all 11 keep
    # their r6 green rows + full-registry pytest coverage):
    # anti_join_customers (anti-join chain: orders_no_bulk_item is
    # in-window), bulk_orders (group-having: large_volume_customers),
    # curation_funnel + curation_manifest (contained in the r9-green
    # flagship curation_export_manifest), date_trunc_buckets
    # (date_gallery), envelope_json_roundtrip (envelope_project is
    # r9-green), priority_count (shipmode_priority), promo_share
    # (ratio-agg: share_of_total), text_normalize (text_stats),
    # token_frequencies (tfidf_top_terms + fertility_by_lang),
    # union_by_name (nation_set_ops).  The r11 window should lead with
    # the r10-NEW oracle-paired queries (heavy_hitters,
    # bloom_decontaminate, cosine_topk_pq — none has a driver row
    # yet), then any r11-new/changed queries, then these 11, then the
    # oldest of the r7 cohort (47 queries, listed in
    # CORRECTNESS_r07.json).
    # Permanently out by convention: cosine_topk_fast (bit-exact
    # parity-pinned to cosine_topk) and the rows-only queries
    # (multimodal_features / multimodal_resize PNG-zlib;
    # approx_distinct_users / approx_quantiles / table_profile_approx /
    # length_outliers_approx sketches, error-bound-tested against
    # their exact siblings).
    #
    # r4-latest:
    "minhash_signatures",
    # r5-latest (displaced from the r8 window + dedup_simhash):
    "above_nation_avg",
    "cube_orders",
    "date_gallery",
    "dedup_simhash",
    "filter_project",
    "grouping_sets_sql",
    "longest_doc_per_lang",
    "orders_in_window",
    "orders_no_bulk_item",
    "rank_gallery",
    "scalar_gallery",
    # r6-latest cohort (38 of 49):
    "bpe_token_counts",
    "cosine_topk_ivf",
    "curriculum_deciles",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "doc_fingerprint",
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
    "ngram_decontaminate",
    "pack_chunks",
    "pii_scrub",
    "quality_features",
    "quality_filter_survivors",
    "returned_revenue",
    "revenue_by_nation",
    "segment_totals",
    "semdedup",
    "semi_join_customers",
    "share_of_total",
    "shipmode_priority",
    "snapshot_diff",
    "split_assign",
    "text_stats",
    "tfidf_top_terms",
    "vocab_coverage",
    "winnowing_fingerprints",
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
