"""Embedding clustering: distributed Lloyd's k-means.

The iterative-algorithm pattern on Spark: per-iteration state is the
k×dim centroid matrix — small enough to collect and broadcast — while
the corpus-sized work (assignment) stays a narrow Arrow-vectorized
map and the centroid update is one exact-decimal aggregation.  No
driver-side loop ever touches corpus rows; at 100 TB each iteration is
one scan + one (cluster, dim)-keyed shuffle whose key space is k×dim,
perfectly uniform.

Determinism (rows-only in the driver gate, but reproducible
run-to-run, partitioning-independent — pinned by tests):

* init: centroids = embeddings of the k smallest vec_ids (no RNG);
* assignment: squared-distance accumulation is sequential over dims
  (same IEEE order every run); ties broken by lowest cluster id;
* update: per-(cluster, dim) means via DECIMAL(38,6) sums —
  order-independent, so shuffle nondeterminism cannot perturb the
  next iteration's centroids (a double sum here would make k-means
  results depend on partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table

K_CLUSTERS = 8
N_ITERS = 3
_DEC = "decimal(38,6)"


def _assign(emb: DataFrame, centroids) -> DataFrame:
    """(vec_id, embedding) + k×dim matrix → (vec_id, embedding,
    cluster, sqdist).  Vectorized argmin; distances accumulate
    sequentially over dims (deterministic IEEE order)."""
    import pandas as pd

    import numpy as np
    cents = np.asarray(centroids, dtype=np.float64)      # (k, dim)

    def assign(it):
        for pdf in it:
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = np.zeros((E.shape[0], cents.shape[0]))
            for i in range(cents.shape[1]):              # sequential
                diff = E[:, i:i + 1] - cents[:, i]
                d += diff * diff
            cluster = d.argmin(axis=1)                   # first min wins
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "embedding": pdf["embedding"],
                "cluster": cluster.astype(np.int32),
                "sqdist": d[np.arange(len(cluster)), cluster],
            })

    return emb.mapInPandas(
        assign,
        schema="vec_id long, embedding array<float>, "
               "cluster int, sqdist double")


def _update(assigned: DataFrame, k: int, dim: int):
    """Exact-decimal per-(cluster, dim) means → new k×dim matrix.
    Empty clusters keep their previous centroid absent → caller
    preserves the old row (stable, no NaNs)."""
    rows = (assigned
            .select("cluster", F.posexplode("embedding")
                    .alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg((F.sum(F.col("v").cast("double").cast(_DEC))
                  .cast("double") / F.count("*")).alias("m"))
            .collect())                                  # k*dim rows
    out: dict[int, list[float | None]] = {}
    for r in rows:
        out.setdefault(r.cluster, [None] * dim)[r.dim] = r.m
    return out


def kmeans(emb: DataFrame, k: int = K_CLUSTERS,
           n_iters: int = N_ITERS) -> DataFrame:
    """Returns (vec_id, cluster, sqdist) after ``n_iters`` Lloyd
    rounds from the deterministic seed."""
    seed_rows = (emb.orderBy("vec_id").limit(k)
                 .select("embedding").collect())
    cents = [list(r.embedding) for r in seed_rows]
    dim = len(cents[0])
    assigned = None
    for _ in range(n_iters):
        assigned = _assign(emb, cents).localCheckpoint()
        means = _update(assigned, k, dim)
        cents = [means.get(c, cents[c]) for c in range(k)]
    return assigned.select("vec_id", "cluster", "sqdist")


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans(emb).orderBy("vec_id")


register(QuerySpec(
    "kmeans_embeddings", q_kmeans_embeddings,
    oracle=None,   # multi-iteration Lloyd's: genuinely iterative;
                   # determinism + convergence pinned in pytest
    doc=f"distributed Lloyd's k-means (k={K_CLUSTERS}, "
        f"{N_ITERS} iters, exact-decimal centroid updates)",
    tags=("similarity", "north-star", "iterative", "pandas-udf"),
))
