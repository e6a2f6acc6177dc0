"""Custom stateful streaming operators (applyInPandasWithState) and
the S6 config-parsing surface."""

from __future__ import annotations

from cga_logs_to_kinesis_spark.streaming.config import (
    DirWatch,
    parse_dirs_to_watch,
    parse_files_to_watch,
)
from cga_logs_to_kinesis_spark.streaming.stateful import (
    streaming_dedup_first_seen,
    streaming_running_counters,
)


import pytest


@pytest.fixture(autouse=True)
def _few_state_partitions(spark):
    """Stateful queries create one state store per shuffle partition;
    32 of them per tiny test query is pure overhead."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _stream_from_dir(spark, path, schema):
    return spark.readStream.schema(schema).parquet(str(path))


def test_streaming_dedup_first_seen(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame(
        [("a", "v1"), ("a", "v2"), ("b", "v3"), ("a", "v4"), ("c", "v5")],
        "key string, value string").coalesce(1).write.parquet(str(src))

    out = streaming_dedup_first_seen(
        _stream_from_dir(spark, src, "key string, value string"))
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r.key: r for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert set(rows) == {"a", "b", "c"}      # one emission per key
    assert rows["a"].n_in_batch == 3         # duplicates counted, suppressed


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Second micro-batch re-sends key 'a': state must suppress it.
    Uses a parquet sink — the memory sink can't recover from a
    checkpoint, so it can't model a restarted query."""
    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    schema = "key string, value string"
    spark.createDataFrame([("a", "v1")], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    def drain():
        res = streaming_dedup_first_seen(
            _stream_from_dir(spark, src, schema))
        q = (res.writeStream.format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    spark.createDataFrame([("a", "v9"), ("d", "v2")], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    drain()
    keys = [r.key for r in spark.read.parquet(out).collect()]
    assert sorted(keys) == ["a", "d"]        # 'a' emitted exactly once


def test_streaming_running_counters(spark, tmp_path):
    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    collected: list = []
    schema = "key string, value long"
    spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 10)], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    def drain():
        res = streaming_running_counters(
            _stream_from_dir(spark, src, schema))

        def sink(batch_df, _bid):
            collected.extend(batch_df.collect())

        q = (res.writeStream.foreachBatch(sink)
             .outputMode("update").option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    spark.createDataFrame([("x", 4)], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    drain()
    # update mode: last emission per key reflects cumulative totals
    latest = {r.key: r for r in collected}
    assert latest["x"].total_records == 3
    assert latest["x"].total_value == 7
    assert latest["y"].total_value == 10


def test_parse_files_to_watch():
    assert parse_files_to_watch("/var/log/a.log:/var/log/b.log") == [
        "/var/log/a.log", "/var/log/b.log"]
    assert parse_files_to_watch("") == []
    assert parse_files_to_watch(":/x:") == ["/x"]


def test_parse_dirs_to_watch():
    got = parse_dirs_to_watch("/var/vcap/sys/log/**/*.log:/tmp/logs")
    assert got == [DirWatch("/var/vcap/sys/log", "*.log"),
                   DirWatch("/tmp/logs", "*")]


def test_streaming_rate_anomaly_matches_batch(spark, tmp_path):
    """The stateful trailing z-score must equal the batch window
    operator bit-for-bit when rows arrive in order — including across
    a micro-batch boundary that splits a key's history."""
    import numpy as np

    from cga_logs_to_kinesis_spark.operators.temporal import (
        score_per_minute,
    )
    from cga_logs_to_kinesis_spark.streaming.stateful import (
        streaming_rate_anomaly,
    )

    rng = np.random.default_rng(7)
    rows = [(et, m, int(5 + rng.integers(0, 10) + (50 if m == 60 else 0)))
            for et in ("click", "error") for m in range(80)]
    pdf = spark.createDataFrame(
        rows, "event_type string, minute long, n_events long")

    src = tmp_path / "mins"
    pdf.filter("minute < 40").coalesce(1).write.parquet(
        str(src / "chunk=0"))
    pdf.filter("minute >= 40").coalesce(1).write.parquet(
        str(src / "chunk=1"))
    stream = (spark.readStream
              .schema("event_type string, minute long, n_events long")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    q = (streaming_rate_anomaly(stream)
         .writeStream.format("memory").queryName("anom")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.event_type, r.minute): (r.trail_n, r.z, r.is_anomaly)
           for r in spark.sql("SELECT * FROM anom").collect()}
    want = {(r.event_type, r.minute): (r.trail_n, r.z, r.is_anomaly)
            for r in score_per_minute(pdf).collect()}
    assert got == want
    assert len(got) > 100
    # the planted spike at minute 60 must be flagged
    assert got[("click", 60)][2] and got[("error", 60)][2]
