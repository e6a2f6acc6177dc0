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
