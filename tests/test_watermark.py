"""Watermark / late-data semantics, pinned explicitly (SURVEY §7.4.5:
event-time + watermark is NEW semantics relative to the reference's
ingest-time stamps — so the drop behavior must be a tested contract,
not an accident)."""

from __future__ import annotations

from datetime import datetime

from cga_logs_to_kinesis_spark.streaming.stats import tumbling_stats


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_time timestamp, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(str(path))


def test_late_event_beyond_watermark_dropped(spark, tmp_path):
    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    t = datetime(2024, 1, 1, 0, 0, 0)

    def drain():
        stream = spark.readStream.schema(
            "event_time timestamp, event_type string, value double"
        ).parquet(str(src))
        agg = tumbling_stats(stream, ts_col="event_time",
                             interval_s=5, watermark_s=10)
        q = (agg.writeStream.format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: events at t+0s and t+100s -> watermark advances to t+90s
    _write_batch(spark, src, [
        (t, "a", 1.0),
        (t.replace(minute=1, second=40), "a", 1.0),
    ])
    drain()

    # batch 2: a late event at t+2s — 98s behind the watermark: its
    # 5s window [t, t+5) already closed and emitted, so it is dropped
    _write_batch(spark, src, [(t.replace(second=2), "a", 5.0)])
    drain()
    # batch 3: nothing new; forces final emissions
    _write_batch(spark, src, [
        (t.replace(minute=3), "a", 1.0)])
    drain()

    got = {(r.window_start.isoformat(), r.n_records): r.sum_value
           for r in spark.read.parquet(out).collect()}
    # the [t, t+5) window was emitted with exactly 1 record (the late
    # 5.0-value event never merged into it)
    assert ("2024-01-01T00:00:00", 1) in got
    assert got[("2024-01-01T00:00:00", 1)] == 1.0


def test_on_time_event_within_watermark_merges(spark, tmp_path):
    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    t = datetime(2024, 1, 1, 0, 0, 0)

    def drain():
        stream = spark.readStream.schema(
            "event_time timestamp, event_type string, value double"
        ).parquet(str(src))
        agg = tumbling_stats(stream, ts_col="event_time",
                             interval_s=5, watermark_s=3600)
        q = (agg.writeStream.format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _write_batch(spark, src, [(t, "a", 1.0)])
    drain()
    # same window, next batch — within the generous watermark: merges
    _write_batch(spark, src, [(t.replace(second=2), "a", 2.0)])
    drain()
    # push watermark far ahead so the window finally closes and emits
    _write_batch(spark, src, [(t.replace(hour=2), "a", 0.0)])
    drain()
    _write_batch(spark, src, [(t.replace(hour=4), "a", 0.0)])
    drain()

    rows = [r for r in spark.read.parquet(out).collect()
            if r.window_start == t]
    assert len(rows) == 1
    assert rows[0].n_records == 2          # both events in one window
    assert rows[0].sum_value == 3.0


def test_streaming_sessions_merge_across_batches_and_match_batch(
        spark, tmp_path):
    """Session windows are STATEFUL across micro-batches: two
    gap-adjacent events arriving in different batches must merge into
    one session, and the closed-session output must equal the same
    session_stats expression run in batch mode over the same events
    (parity by construction — pinned here against batch-boundary
    effects)."""
    from cga_logs_to_kinesis_spark.streaming.stats import session_stats

    src = tmp_path / "src"
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    t = datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_time timestamp, user_id long, value double"

    def _write(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(src))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        agg = session_stats(stream, key_col="user_id", gap_s=10,
                            watermark_s=5)
        q = (agg.writeStream.format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: user 1 starts a session; user 2 a separate one.  The
    # max event time stays at 6s, so the watermark (1s) is well below
    # user 1's open session end — it must stay OPEN across the batch
    # boundary.
    _write([(t, 1, 1.0), (t.replace(second=4), 1, 2.0),
            (t.replace(second=6), 2, 5.0)])
    drain()
    # batch 2: user 1's event 8s after their last — INSIDE the 10s
    # gap, so it must merge into the open session from batch 1
    _write([(t.replace(second=12), 1, 4.0)])
    drain()
    # batch 3: a far-future event advances the watermark past every
    # session end, closing and emitting them
    _write([(t.replace(minute=10), 9, 0.0)])
    drain()

    got = {(r.user_id, r.session_start.isoformat(),
            r.session_end.isoformat(), r.n_events): r.sum_value
           for r in spark.read.parquet(out).collect()
           if r.user_id != 9}
    # batch twin over the SAME events (sentinel excluded)
    batch = spark.createDataFrame(
        [(t, 1, 1.0), (t.replace(second=4), 1, 2.0),
         (t.replace(second=6), 2, 5.0),
         (t.replace(second=12), 1, 4.0)], schema)
    want = {(r.user_id, r.session_start.isoformat(),
             r.session_end.isoformat(), r.n_events): r.sum_value
            for r in session_stats(batch, key_col="user_id",
                                   gap_s=10).collect()}
    assert got == want
    # the merged session: 3 events spanning both batches, one row
    assert (1, "2024-01-01T00:00:00", "2024-01-01T00:00:22", 3) in got
    assert got[(1, "2024-01-01T00:00:00", "2024-01-01T00:00:22", 3)] \
        == 7.0
