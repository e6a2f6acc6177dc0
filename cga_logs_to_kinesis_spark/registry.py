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
    # -- round-4 curation ------------------------------------------------
    # r3 ERR (events timestamp[us] regression) or hash-fail (HUGEINT
    # oracles), all fixed this round — need fresh green driver rows:
    "stats_tumbling",
    "asof_last_signup",
    "range_join_error_after_purchase",
    "dedup_events_first",
    "funnel_conversion",
    "multi_resolution_rollup",
    "array_functions",
    "domain_cap",
    "corpus_stats",
    "token_length_histogram",
    "passage_dedup",
    "mixture_weights",
    "vocab_coverage",
    # output changed this round (NULL-free lag sentinel):
    "running_revenue",
    # never appeared in any driver window yet:
    "ann_recall_report",
    "dedup_containment",
    "pca_project",
    # new operators this round (kmeans newly oracle-paired — its prior
    # driver rows were rows-only):
    "unigram_rarity",
    "winnowing_fingerprints",
    "prune_frequent_tokens",
    "kmeans_embeddings",
    "cosine_topk_fast",
    "bm25_topk",
    "char_diversity",
    "dedup_source_flow",
    "dedup_winnow_pairs",
    "dedup_simhash_pairs",
    # events-reading queries revalidated after the load_events rewrite
    # (last green row predates the fixture format change):
    "distinct_users",
    "json_props",
    "map_functions",
    "pivot_event_types",
    "conditional_pivot",
    "sliding_window",
    "session_windows",
    # family keepers (actively-tuned plans stay driver-visible):
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "cosine_topk_lsh",
    "revenue_by_nation",
    # stale-green refresh: last green row is r01; rotate back through
    # before those rows age out of trust:
    "batch_pages",
    "envelope_project",
    "dedup_exact",
    "dedup_exact_survivors",
    "minhash_signatures",
    "cosine_topk",
    "pricing_summary",
    "shipping_priority",
    "top3_orders_per_customer",
    "global_topk",
    "similar_part_names",
    "price_percentiles",
)


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side-effect: registration).

    Returns the registry ordered for the driver contract: the curated
    :data:`DRIVER_WINDOW` first (the driver checks only the first 50
    entries), then every remaining query alphabetically.
    """
    from cga_logs_to_kinesis_spark.operators import (  # noqa: F401
        clustering,
        corpus_quality,
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
