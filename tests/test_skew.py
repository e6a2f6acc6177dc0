"""Skew-mitigation utilities: salted join/agg must preserve exact
results while spreading hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.skew import salted_agg, salted_join


def _skewed_df(spark, n=10_000):
    """90% of rows share one hot key."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot")
        .otherwise(F.concat(F.lit("k"), F.col("id") % 100))
        .alias("key"),
        F.col("id").alias("v"))


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("k7", 2), ("k13", 3)], "key string, w int")
    plain = (big.join(small, "key")
             .groupBy("key").agg(F.count("*").alias("n"),
                                 F.sum("v").alias("s")))
    salted = (salted_join(big, small, "key", n_salts=8)
              .groupBy("key").agg(F.count("*").alias("n"),
                                  F.sum("v").alias("s")))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = _skewed_df(spark, 1000)
    small = spark.createDataFrame([("hot", 1)], "key string, w int")
    plain = big.join(small, "key", "left").filter(F.col("w").isNull())
    salted = salted_join(big, small, "key", how="left") \
        .filter(F.col("w").isNull())
    assert plain.count() == salted.count()


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("key").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_agg(
        df, "key",
        aggs=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
        final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")])
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_minhash_hot_bucket_is_bounded(spark):
    """Behavioral guard for the MAX_BUCKET cap: a boilerplate flood
    (thousands of near-identical docs collapsing into one LSH bucket)
    must NOT produce O(n^2) candidate pairs — the degenerate bucket is
    dropped, while genuinely similar small clusters still pair up."""
    from cga_logs_to_kinesis_spark.operators.dedup import (
        MAX_BUCKET,
        minhash_candidates,
    )

    n_flood = MAX_BUCKET + 200
    flood = spark.range(n_flood).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text repeated on every "
              "page of the crawl forever and ever").alias("text"))
    # two near-dup docs that should still be found
    pair = spark.createDataFrame(
        [(100001, "alpha beta gamma delta epsilon zeta eta theta "
                  "iota kappa lambda mu"),
         (100002, "alpha beta gamma delta epsilon zeta eta theta "
                  "iota kappa lambda nu")],
        "doc_id long, text string")
    cands = minhash_candidates(flood.unionByName(pair))
    rows = cands.collect()
    # without the cap the flood alone yields ~n^2/2 > 700k pairs
    assert len(rows) < 100
    assert not any(r.doc_a < 100000 and r.doc_b < 100000 for r in rows)
    assert any({r.doc_a, r.doc_b} == {100001, 100002} for r in rows)


def test_ann_incremental_hot_bucket_is_bounded(spark):
    """Behavioral guard for ANN_MAX_BUCKET: a degenerate embedding
    region (here: thousands of IDENTICAL vectors, so every LSH table
    puts them in one bucket) must not make the persisted-index join
    superlinear — the hot seen buckets are dropped wholesale, while a
    batch vector matching a small healthy cluster still retrieves its
    neighbors."""
    from cga_logs_to_kinesis_spark.operators.similarity import (
        ANN_MAX_BUCKET,
        ann_incremental_from_index,
        lsh_table_buckets_vec,
    )
    from cga_logs_to_kinesis_spark.schema import EMBEDDING_DIM

    n_flood = ANN_MAX_BUCKET + 200
    flood_vec = [1.0] * EMBEDDING_DIM
    cluster = [float(1 if i % 2 == 0 else -1) + 0.01 * i
               for i in range(EMBEDDING_DIM)]
    seen = (spark.range(n_flood)
            .select(F.col("id").alias("vec_id"),
                    F.array(*[F.lit(x) for x in flood_vec])
                    .cast("array<float>").alias("embedding"))
            .unionByName(spark.createDataFrame(
                [(200001, cluster), (200002, cluster)],
                "vec_id long, embedding array<float>")))
    # batch: one vector inside the flood region, one matching the
    # healthy cluster
    batch = spark.createDataFrame(
        [(300001, flood_vec), (300002, cluster)],
        "vec_id long, embedding array<float>")
    seen_b = seen.select(
        "vec_id",
        F.explode(lsh_table_buckets_vec("embedding")).alias("bucket"))
    out = ann_incremental_from_index(seen_b, seen, batch).collect()
    # the flood bucket (> ANN_MAX_BUCKET members in every table) is
    # dropped: the flood-region batch vector gets ZERO candidates
    # instead of n_flood, so no row references it
    assert not any(r.batch_vec == 300001 for r in out)
    # the healthy cluster still retrieves — and its candidate count is
    # the cluster, not the corpus
    cluster_rows = [r for r in out if r.batch_vec == 300002]
    assert cluster_rows, "healthy cluster lost its neighbors"
    assert all(r.n_candidates <= 10 for r in cluster_rows)
    assert {r.nearest_seen for r in cluster_rows} == {200001, 200002}
