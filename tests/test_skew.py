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
