"""Graph analytics over the document-similarity graph.

``pagerank_docs`` ranks documents by centrality in the near-duplicate
candidate graph (winnowing pairs): high-rank nodes are boilerplate
hubs — templates whose fragments appear in many documents — which is
exactly what a curation pipeline wants surfaced for removal, beyond
what pairwise dedup sees.

Iterative-engine design, same discipline as ``kmeans_embeddings`` /
``dedup_components``:

* fixed iteration count (3), unrolled in the DuckDB oracle as a CTE
  chain — every float op is replayed identically, so the result is
  hash-exact, not approximately-equal;
* per-edge contributions are IEEE doubles from deterministic inputs
  (``(0.85 * rank) / outdeg``); the only order-sensitive step — the
  per-target SUM — goes through DECIMAL(38,12) casts, making the
  aggregation order-free across partitionings (the ``functions/
  exact.py`` argument).  Scale 12 deliberately: the quantum must sit
  well ABOVE one double ULP of the contributions, or the two engines'
  rounding-direction choices near midpoints diverge (scale 18 failed
  the hash by 1 ULP), while staying far below the ~1/N rank scale;
* the edge list is ``localCheckpoint``-ed once (reused by the degree
  table and all 3 iterations), the iteration state is (doc_id, rank)
  — never the text;
* the node-count scalar rides a 1-row broadcast, no driver actions.

Symmetric graphs have no dangling nodes (every node has out-degree
≥ 1), so the classic dangling-mass correction is a no-op here and is
deliberately omitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session

PAGERANK_ITERS = 3
PAGERANK_D = 0.85
_DECR = "decimal(38,12)"


def pagerank(pairs: DataFrame, iters: int = PAGERANK_ITERS,
             damping: float = PAGERANK_D) -> DataFrame:
    """PageRank over an undirected pair list (doc_a, doc_b)."""
    # Hash-partition the edge list by src ONCE before the checkpoint
    # (optimization r18, guide §2.4): localCheckpoint preserves the
    # physical partitioning, so the contribution join each iteration
    # and the degree fold all reuse it — previously the edge set (the
    # loop's biggest frame; corpus-fraction-sized at 100 TB)
    # re-exchanged every iteration.  AQE sizes the exchange.  The
    # edges checkpoint is lazy; deg's eager checkpoint materializes
    # both in one job (guide §5: fewer sequential driver round-trips).
    # Symmetrized by a row-local explode, not a self-union: the pair
    # list is a computed subtree (the winnowing candidate join) and a
    # union would evaluate it once per branch (guide §1.2).
    edges = (pairs.select(F.explode(F.array(
                 F.struct(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst")),
                 F.struct(F.col("doc_b").alias("src"),
                          F.col("doc_a").alias("dst")))).alias("e"))
             .select("e.src", "e.dst")
             .repartition(F.col("src"))
             .localCheckpoint(eager=False))
    # deg is referenced by the init frame, n_nodes, and every
    # iteration's rank update — checkpoint the (node, degree) pairs
    # once instead of re-aggregating edges 5 times; the groupBy
    # reuses edges' src partitioning (no exchange) and deg itself
    # comes out src-partitioned for the per-iteration rank join.
    deg = (edges.groupBy("src").agg(F.count("*").alias("outdeg"))
           .localCheckpoint())
    n_nodes = F.broadcast(deg.agg(F.count("*").alias("n_nodes")))
    rank = (deg.crossJoin(n_nodes)
            .select(F.col("src").alias("doc_id"), "outdeg",
                    (F.lit(1.0) / F.col("n_nodes")).alias("rank")))
    for _ in range(iters):
        contrib = (edges
                   .join(rank, edges.src == rank.doc_id)
                   .select(F.col("dst"),
                           (F.lit(damping) * F.col("rank")
                            / F.col("outdeg")).alias("c")))
        in_sum = (contrib.groupBy("dst")
                  .agg(F.sum(F.col("c").cast(_DECR)).cast("double")
                       .alias("in_sum")))
        rank = (deg
                .join(in_sum, deg.src == in_sum.dst)
                .crossJoin(n_nodes)
                .select(F.col("src").alias("doc_id"), "outdeg",
                        (F.lit(1.0 - damping) / F.col("n_nodes")
                         + F.col("in_sum")).alias("rank")))
    return rank.select("doc_id", "rank").orderBy("doc_id")


def q_pagerank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cga_logs_to_kinesis_spark.operators.corpus_quality import (
        q_dedup_winnow_pairs,
    )
    tune_session(spark)
    pairs = q_dedup_winnow_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return pagerank(pairs)


def _pagerank_oracle() -> str:
    from cga_logs_to_kinesis_spark.registry import _REGISTRY

    pairs = _REGISTRY["dedup_winnow_pairs"].oracle
    d = repr(PAGERANK_D)
    base = f"CAST({repr(1.0 - PAGERANK_D)} AS DOUBLE) / n.n_nodes"
    step = """
        r{K} AS (
            SELECT deg.src AS doc_id, deg.outdeg,
                   {base}
                   + CAST(SUM(CAST((CAST({d} AS DOUBLE) * p.rank)
                                   / p.outdeg AS DECIMAL(38,12)))
                          AS DOUBLE) AS rank
            FROM edges e
            JOIN r{P} p ON e.src = p.doc_id
            JOIN deg ON deg.src = e.dst
            CROSS JOIN n
            GROUP BY deg.src, deg.outdeg, n.n_nodes
        )"""
    chain = ",".join(
        step.format(K=k, P=k - 1, base=base, d=d)
        for k in range(1, PAGERANK_ITERS + 1))
    return f"""
        WITH pairs AS ({pairs}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        n AS (SELECT COUNT(*) AS n_nodes FROM deg),
        r0 AS (
            SELECT src AS doc_id, outdeg,
                   CAST(1.0 AS DOUBLE) / n.n_nodes AS rank
            FROM deg CROSS JOIN n
        ),{chain}
        SELECT doc_id, rank FROM r{PAGERANK_ITERS} ORDER BY doc_id
    """


register(QuerySpec(
    "pagerank_docs", q_pagerank_docs,
    oracle=_pagerank_oracle(),
    doc="PageRank centrality over the winnowing near-dup candidate "
        "graph (3 damped iterations, decimal-exact contribution sums, "
        "unrolled-CTE oracle) — surfaces boilerplate template hubs",
    tags=("graph", "iterative", "north-star", "dedup"),
))
