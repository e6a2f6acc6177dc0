"""Stream-stream joins and watermarked streaming dedup — the last of
the Structured Streaming operator surface.

A stream-stream inner join buffers both sides in state; the time-
interval condition plus watermarks is what lets Spark evict state, so
the join runs forever at bounded memory — the property that matters at
100 TB/day."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F


def test_stream_stream_interval_join(spark, tmp_path):
    t = datetime(2024, 1, 1, 12, 0, 0)
    purchases = [(1, 100 + i, t + timedelta(seconds=30 * i))
                 for i in range(4)]
    # condition: error within the 20 s BEFORE the purchase
    errors = [(1, 900, t + timedelta(seconds=10)),       # joins p1 (t+30)
              (1, 901, t + timedelta(seconds=55)),       # joins p2 (t+60)
              (2, 902, t + timedelta(seconds=5))]        # wrong user

    pdir, edir = tmp_path / "p", tmp_path / "e"
    spark.createDataFrame(
        purchases, "user_id long, purchase_id long, p_time timestamp"
    ).write.parquet(str(pdir))
    spark.createDataFrame(
        errors, "e_user long, error_id long, e_time timestamp"
    ).write.parquet(str(edir))

    p = (spark.readStream.schema(
            "user_id long, purchase_id long, p_time timestamp")
         .parquet(str(pdir)).withWatermark("p_time", "1 minute"))
    e = (spark.readStream.schema(
            "e_user long, error_id long, e_time timestamp")
         .parquet(str(edir)).withWatermark("e_time", "1 minute"))

    joined = p.join(
        e, (F.col("user_id") == F.col("e_user"))
        & (F.col("e_time") >= F.col("p_time") - F.expr("interval 20 seconds"))
        & (F.col("e_time") <= F.col("p_time")))

    q = (joined.writeStream.format("memory").queryName("ssj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.purchase_id, r.error_id)
           for r in spark.sql("SELECT * FROM ssj").collect()}
    assert got == {(101, 900), (102, 901)}


def test_streaming_drop_duplicates_within_watermark(spark, tmp_path):
    t = datetime(2024, 1, 1, 12, 0, 0)
    src = tmp_path / "src"
    rows = [("k1", t), ("k1", t + timedelta(seconds=1)),   # dup of k1
            ("k2", t + timedelta(seconds=2))]
    spark.createDataFrame(rows, "key string, ts timestamp") \
        .coalesce(1).write.parquet(str(src))

    stream = (spark.readStream.schema("key string, ts timestamp")
              .parquet(str(src))
              .withWatermark("ts", "10 seconds"))
    deduped = stream.dropDuplicatesWithinWatermark(["key"])

    q = (deduped.writeStream.format("memory").queryName("ddw")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    keys = sorted(r.key for r in spark.sql("SELECT * FROM ddw").collect())
    assert keys == ["k1", "k2"]
