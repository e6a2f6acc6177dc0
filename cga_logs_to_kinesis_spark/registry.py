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
    # -- no driver row yet (r01 indices 50-70) --------------------------
    "dedup_embedding_cosine",
    "cosine_topk_fast",
    "asof_last_signup",
    "range_join_error_after_purchase",
    "text_stats",
    "quality_features",
    "lang_id",
    "doc_fingerprint",
    "bpe_token_counts",
    "tfidf_top_terms",
    "quality_filter_survivors",
    "dedup_events_first",
    "funnel_conversion",
    "date_trunc_buckets",
    "multi_resolution_rollup",
    "share_of_total",
    "priority_count",
    "promo_share",
    "returned_revenue",
    "large_volume_customers",
    "shipmode_priority",
    # -- r01 hard error, fixed this round -------------------------------
    "array_functions",
    # -- new this round (no driver row yet) -----------------------------
    "split_assign",
    "stratified_sample",
    "pack_chunks",
    "gopher_repetition",
    "ngram_decontaminate",
    "pii_scrub",
    "embedding_centroids",
    "domain_cap",
    "corpus_stats",
    "multimodal_raw_features",
    "multimodal_raw_resize",
    "dedup_components",
    "kmeans_embeddings",
    "token_length_histogram",
    "curriculum_deciles",
    "passage_dedup",
    "mixture_weights",
    "embedding_quantize",
    "semdedup",
    "vocab_coverage",
    "cosine_topk_ivf",
    "dedup_incremental",
    "embedding_covariance",
    # -- keepers: one slot per family / actively-reworked operator ------
    # (dedup/text families stay in-window because the round-2 LSH
    # rewrite and explode_parallelism change touched their plans;
    # stable r01-green gallery queries rotated out to make room.)
    # minhash_signatures rotated out (r01 green; its signature code
    # path stays covered in-window via dedup_minhash_lsh)
    "stats_tumbling",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "cosine_topk_lsh",
    "revenue_by_nation",
)


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side-effect: registration).

    Returns the registry ordered for the driver contract: the curated
    :data:`DRIVER_WINDOW` first (the driver checks only the first 50
    entries), then every remaining query alphabetically.
    """
    from cga_logs_to_kinesis_spark.operators import (  # noqa: F401
        clustering,
        dedup,
        llm_pipeline,
        multimodal,
        pipeline_ops,
        relational,
        relational2,
        relational3,
        similarity,
        temporal,
        text,
        tpch_shapes,
    )
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        ordered[name] = _REGISTRY[name]
    for name in sorted(_REGISTRY):
        ordered.setdefault(name, _REGISTRY[name])
    return ordered
