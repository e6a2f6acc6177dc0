"""Lloyd's k-means: determinism, convergence, and cluster sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.operators.clustering import (
    K_CLUSTERS,
    kmeans,
)
from cga_logs_to_kinesis_spark.sources import load_table
from cga_logs_to_kinesis_spark.session import tune_session
from tests.conftest import SF_SMOKE


def _emb(spark):
    tune_session(spark)
    return load_table(spark, SF_SMOKE, "embeddings")


def test_kmeans_deterministic_across_runs(spark):
    a = {r.vec_id: (r.cluster, r.sqdist)
         for r in kmeans(_emb(spark)).collect()}
    b = {r.vec_id: (r.cluster, r.sqdist)
         for r in kmeans(_emb(spark).repartition(7)).collect()}
    assert a == b          # partitioning must not change results


def test_kmeans_inertia_non_increasing(spark):
    emb = _emb(spark)
    inertias = []
    for iters in (1, 2, 3):
        tot = (kmeans(emb, n_iters=iters)
               .agg(F.sum("sqdist").alias("s")).collect()[0].s)
        inertias.append(tot)
    assert inertias[0] >= inertias[1] >= inertias[2]


def test_kmeans_covers_all_vectors(spark):
    emb = _emb(spark)
    out = kmeans(emb)
    assert out.count() == emb.count()
    clusters = {r.cluster for r in out.select("cluster")
                .distinct().collect()}
    assert clusters <= set(range(K_CLUSTERS))
    assert len(clusters) > 1
