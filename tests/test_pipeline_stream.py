"""End-to-end streaming pipeline test: watched dir → Envelope → sink
(the reference's whole job, main.go:371-419), plus the A1 stats stream
and watermark semantics."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.sources import load_events
from cga_logs_to_kinesis_spark.streaming.pipeline import (
    PipelineConfig,
    build_pipeline,
)
from cga_logs_to_kinesis_spark.streaming.stats import (
    running_totals,
    tumbling_stats,
)
from tests.conftest import SF_SMOKE
from cga_logs_to_kinesis_spark.streaming.faults import JsonDirTransport


def test_pipeline_end_to_end(spark, tmp_path):
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "a.log").write_text("alpha\nbeta\n")
    (watch / "b.log").write_text("gamma\n")
    (watch / "ignored.txt").write_text("nope\n")   # glob-filtered (S3)

    out = tmp_path / "delivered"
    query, stats = build_pipeline(
        spark,
        PipelineConfig(watch_dir=str(watch), glob="*.log",
                       origin="inst-1",
                       checkpoint_dir=str(tmp_path / "ckpt"),
                       available_now=True),
        JsonDirTransport(str(out)))
    query.awaitTermination(120)

    delivered = []
    for f in out.glob("page-*.json"):
        delivered.extend(json.loads(f.read_text()))
    assert len(delivered) == 3                      # ignored.txt skipped
    payloads = [json.loads(d) for d, _k in delivered]
    msgs = set()
    for p in payloads:
        assert p["origin"] == "inst-1"
        assert p["event_type"] == "LogMessage"
        assert p["log_message"]["source_type"] == "bosh"
        msgs.add(p["log_message"]["message"])
    assert stats.records_sent == 3
    assert stats.records_dropped == 0


def test_pipeline_checkpoint_no_reprocess(spark, tmp_path):
    """Restarting with the same checkpoint must not re-deliver old
    files — stronger than the reference, which loses its buffer and
    tails from EOF on restart (SURVEY.md §7.4.3)."""
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "a.log").write_text("one\n")
    out = tmp_path / "delivered"
    ckpt = str(tmp_path / "ckpt")

    cfg = PipelineConfig(watch_dir=str(watch), glob="*.log",
                         checkpoint_dir=ckpt, available_now=True)
    q1, s1 = build_pipeline(spark, cfg, JsonDirTransport(str(out)))
    q1.awaitTermination(120)
    assert s1.records_sent == 1

    (watch / "b.log").write_text("two\nthree\n")
    q2, s2 = build_pipeline(spark, cfg, JsonDirTransport(str(out)))
    q2.awaitTermination(120)
    assert s2.records_sent == 2        # only the new file


def test_crash_mid_batch_restart_loses_nothing(spark, tmp_path):
    """Chaos test for the sink's restart story: the transport dies
    with FatalDeliveryError after ONE page of a 3-page batch (1200
    records, one partition key, pages of 500) — real side effects
    already committed.  Restarting from the same checkpoint must
    replay the failed batch so that

    * every input record is delivered at least once (no loss — the
      reference instead loses its in-memory buffer on crash,
      batchproducer.go:284-311);
    * the only duplicates are the replayed pre-crash page (bounded
      at-least-once, not unbounded re-delivery);
    * counters never count the failed attempt (run-1 stats stay 0,
      run-2 stats equal the full batch) — counter consistency.
    """
    from cga_logs_to_kinesis_spark.streaming.faults import (
        DieAfterPagesTransport,
    )

    n_lines = 1200
    watch = tmp_path / "logs"
    watch.mkdir()
    (watch / "a.log").write_text(
        "".join(f"line-{i:05d}\n" for i in range(n_lines)))
    out = tmp_path / "delivered"
    cfg = PipelineConfig(watch_dir=str(watch), glob="*.log",
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         available_now=True)

    q1, s1 = build_pipeline(spark, cfg,
                            DieAfterPagesTransport(str(out), 1))
    crashed = False
    try:
        q1.awaitTermination(120)
    except Exception:
        crashed = True
    assert crashed, "the injected FatalDeliveryError must fail the query"
    pre_crash = list(out.glob("page-*.json"))
    assert len(pre_crash) == 1          # one page committed, then death
    assert s1.records_sent == 0         # failed batch never hits counters

    q2, s2 = build_pipeline(spark, cfg,
                            DieAfterPagesTransport(str(out), 1))
    q2.awaitTermination(120)
    assert s2.records_sent == n_lines   # full replayed batch counted once

    import base64
    from collections import Counter

    def msg(data: str) -> str:
        # log_message.message is binary → base64 in the JSON wire form
        return base64.b64decode(
            json.loads(data)["log_message"]["message"]).decode()

    seen: Counter[str] = Counter()
    for f in out.glob("page-*.json"):
        for data, _key in json.loads(f.read_text()):
            seen[msg(data)] += 1
    expect = {f"line-{i:05d}" for i in range(n_lines)}
    assert set(seen) == expect, "records lost across crash+restart"
    dupes = {m for m, n in seen.items() if n > 1}
    pre_crash_msgs = {msg(data) for data, _key
                      in json.loads(pre_crash[0].read_text())}
    assert dupes == pre_crash_msgs      # replay bounds the duplicates


def test_tumbling_stats_batch_equivalence(spark):
    """A1 stats on the events fixture: the streaming aggregation and
    its batch expression agree (same code path, window() built-in)."""
    ev = load_events(spark, SF_SMOKE)
    out = tumbling_stats(ev, ts_col="event_time").collect()
    assert len(out) > 0
    total = sum(r.n_records for r in out)
    assert total == ev.count()
    for r in out:
        assert (r.window_end - r.window_start).total_seconds() == 5.0


def test_tumbling_stats_streaming_with_watermark(spark, tmp_path):
    """Run A1 as an actual stream over the events fixture via a file
    stream source; availableNow drains it like the reference's
    Flush-on-shutdown (B7)."""
    src_dir = tmp_path / "stream_src"
    ev = load_events(spark, SF_SMOKE).select(
        "event_id", "event_time", "event_type", "value")
    ev.write.parquet(str(src_dir))

    stream = (spark.readStream.schema(ev.schema)
              .parquet(str(src_dir)))
    agg = tumbling_stats(stream, ts_col="event_time")
    q = (agg.writeStream.format("memory").queryName("stats_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT sum(n_records) AS n FROM stats_out").collect()[0].n
    want = ev.count()
    # append mode emits only windows the watermark has closed; with
    # availableNow over a finite source the final watermark leaves the
    # last window(s) open — everything else must be out.
    assert got is not None and got >= want * 0.95


def test_running_totals_update_mode(spark):
    ev = load_events(spark, SF_SMOKE)
    stats = tumbling_stats(ev, ts_col="event_time")
    totals = running_totals(stats).collect()
    by_type = {r.event_type: r.total_records for r in totals}
    want = {r.event_type: r.n for r in
            ev.groupBy("event_type").agg(
                F.count("*").alias("n")).collect()}
    assert by_type == want
