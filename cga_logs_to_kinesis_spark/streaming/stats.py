"""Streaming metrics: the reference's A1/A2 observability surface.

A1 — tumbling StatsBatch (reference ``batchproducer.go:54-62,446-458``,
5 s StatInterval ``main.go:91``): an event-time tumbling window over a
record stream.  A2 — cumulative counters by label (reference
``main.go:28-47,147-152``): a running aggregation in update mode (or
the DeliveryStats counters in sink.py for the delivery path itself).

Watermarking is *new* semantics relative to the reference (which
timestamps at ingest and can never see late data); late events beyond
the watermark are dropped, which tests pin down explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_stats(records: DataFrame, ts_col: str = "event_time",
                   key_col: str = "event_type",
                   interval_s: int = 5,
                   watermark_s: int = 10) -> DataFrame:
    """5-second tumbling count/sum per key — A1 as Structured Streaming.

    Works on both batch and streaming DataFrames; on a stream the
    watermark bounds state so the aggregation runs forever at constant
    memory (the reference's equivalent bound is its 5000-record buffer).
    """
    src = records
    if records.isStreaming:
        src = records.withWatermark(ts_col, f"{watermark_s} seconds")
    return (
        src
        .groupBy(F.window(F.col(ts_col), f"{interval_s} seconds"),
                 F.col(key_col))
        .agg(F.count("*").alias("n_records"),
             F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                key_col, "n_records", "sum_value")
    )


def session_stats(records: DataFrame, ts_col: str = "event_time",
                  key_col: str = "user_id",
                  gap_s: int = 300,
                  watermark_s: int = 10) -> DataFrame:
    """Gap-based session windows per key — the streaming twin of the
    registry's ``session_windows`` query (same ``F.session_window``
    expression, so batch/stream parity holds by construction on
    closed sessions).

    Works on both batch and streaming inputs; on a stream the
    watermark is what CLOSES a session: a session emits once the
    watermark passes its end (last event + gap), and state stays
    bounded by the number of open sessions — the property that lets
    per-user sessionization run forever at 100 TB arrival volumes.
    Events later than the watermark are dropped, the same tested
    contract as ``tumbling_stats`` (tests/test_watermark.py).
    """
    src = records
    if records.isStreaming:
        src = records.withWatermark(ts_col, f"{watermark_s} seconds")
    return (
        src
        .groupBy(F.session_window(F.col(ts_col), f"{gap_s} seconds"),
                 F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                key_col, "n_events", "sum_value")
    )


def running_totals(stats_stream: DataFrame,
                   key_col: str = "event_type") -> DataFrame:
    """A2: cumulative counters by label (use outputMode('update'))."""
    return (stats_stream
            .groupBy(key_col)
            .agg(F.sum("n_records").alias("total_records"),
                 F.sum("sum_value").alias("total_value")))
