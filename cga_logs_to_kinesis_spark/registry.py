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
    # -- round-6 curation ------------------------------------------------
    # Every r5 window row came back green (47 hash + 3 rows-only), so
    # this round executes the rotation planned in the r5 comment:
    # never-checked first, then the r1-stale six, then everything whose
    # code or oracle changed in r6 (the WS_PLUS explicit-whitespace
    # class, the null-safe token counts, the un-hinted customer
    # broadcasts, the newly oracle-paired multimodal raw/audio trio),
    # then the two r3 cohorts.  Left for the r7 window (r5-latest after
    # this round): volume_shipping..idle_customers (the r5 TPC-H
    # shapes), shard_assign, pagerank_docs, dedup_near_survivors,
    # dedup_recall_report, retention_cohorts, rate_anomaly,
    # modal_agreement, the dedup_substring trio, bpe_learn_merges,
    # bigram_surprisal, dsir_importance, pca_project, bm25_topk,
    # unigram_rarity, char_diversity, embedding_covariance,
    # quality_weighted_sample, stratified_sample, plus rows-only
    # multimodal_features / multimodal_resize (PNG zlib: genuinely
    # non-SQL) and approx_distinct_users (sketch: error-bound-tested
    # instead, tests/test_consumer_and_approx.py).
    # Never driver-checked yet (FIRST priority in r7): the r6-late
    # additions embedding_validity, dedup_minhash_incremental,
    # split_leakage, and split_repair (all hash-green in
    # tools/check.py at sf0.01 AND sf0.1 this round).
    #
    # never driver-checked:
    "snapshot_diff",
    # r1-latest, five rounds stale:
    "envelope_json_roundtrip",
    "nation_set_ops",
    "union_by_name",
    "anti_join_customers",
    "semi_join_customers",
    "bulk_orders",
    # newly oracle-paired this round (no_oracle -> hash rows):
    "multimodal_raw_features",
    "multimodal_raw_resize",
    "multimodal_audio_features",
    "multimodal_video_frames",
    # code/oracle changed this round — needs a fresh row:
    "revenue_by_nation",     # customer broadcast un-hinted
    "segment_totals",        # customer broadcast un-hinted
    "gopher_quality",        # stop_hits NULL-coalesce
    "fertility_by_lang",     # null-safe BPE token count
    "text_normalize",        # explicit whitespace class
    "token_frequencies",     # NORMALIZED_SQL explicit class
    "curation_funnel",       # empty-funnel COALESCE + norm class
    "curation_manifest",     # NORMALIZED_SQL via shared constant
    "vocab_coverage",        # NORMALIZED_SQL explicit class
    "dedup_exact",           # normalized_text explicit class
    "dedup_minhash_lsh",     # shingles over normalized_text
    "winnowing_fingerprints",# fingerprints over normalized tokens
    # r3-latest cohort (displaced by the r5 window):
    "text_stats",
    "tfidf_top_terms",
    "pack_chunks",
    "gopher_repetition",
    "ngram_decontaminate",
    "curriculum_deciles",
    "embedding_centroids",
    "embedding_quantize",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "semdedup",
    "bpe_token_counts",      # also changed: try_divide on bpe_per_word
    "cosine_topk_ivf",
    "dedup_components",
    # r3-latest cohort (planned for r6 in the r5 comment):
    "date_trunc_buckets",
    "large_volume_customers",
    "priority_count",
    "promo_share",
    "quality_features",      # also changed: try_divide on the ratios
    "quality_filter_survivors",
    "returned_revenue",
    "share_of_total",
    "shipmode_priority",
    "lang_id",               # also changed: WS_PLUS tokenizer split
    "doc_fingerprint",       # also changed: WS_PLUS digest normalize
    "pii_scrub",
    "split_assign",
    # stratified_sample displaced by multimodal_video_frames (newly
    # oracle-paired beats a row-local op pinned by pytest); rotate it
    # into r7.
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
