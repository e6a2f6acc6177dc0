"""The reference pipeline end-to-end: watched files → Envelope → sink.

Reference dataflow (``main.go``): tail files / glob-scan dirs (S1/S3)
→ per-line Envelope projection (T1) → protobuf serialize (T3) →
key-partitioned batching producer → Kinesis PutRecords (K1), stats on a
5 s interval (A1).  Spark-first equivalent: file stream source with
``pathGlobFilter`` → codegen'd projection → JSON serialize →
``foreachBatch`` delivery sink, ``trigger(processingTime="5 seconds")``
as the FlushInterval, checkpointing as the (stronger) replacement for
the in-memory buffer.

Semantic deviation, documented per SURVEY.md §7.4: Spark's file source
ingests new *files*, not appends to existing ones (the reference runs
``tail --follow=name``, main.go:215).  The unit of ingest here is the
rotated/closed file — idiomatic for a distributed engine, and the
rotation case is exactly what the reference's ``--retry`` handles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from cga_logs_to_kinesis_spark.streaming.envelope import (
    FLUSH_INTERVAL_S,
    envelope_projection,
    envelope_to_json,
)
from cga_logs_to_kinesis_spark.streaming.sink import (
    DeliveryStats,
    SinkConfig,
    Transport,
    foreach_batch_sink,
)


@dataclass
class PipelineConfig:
    """Engine config ≈ the reference's env-var surface
    (main.go:375-407, ctl.erb:17-27)."""
    watch_dir: str                       # DIRS_TO_WATCH root
    glob: str = "*.log"                  # the /**/ glob part
    origin: str = "spark-engine"         # $INSTANCE
    checkpoint_dir: str | None = None
    flush_interval_s: int = FLUSH_INTERVAL_S
    available_now: bool = False          # drain-and-stop (tests/backfill)
    max_files_per_trigger: int | None = None  # rate limiting (B1)


def build_pipeline(spark: SparkSession, cfg: PipelineConfig,
                   transport: Transport,
                   sink_cfg: SinkConfig | None = None,
                   ) -> tuple[StreamingQuery, DeliveryStats]:
    """Assemble and start the streaming query. Returns (query, stats)."""
    sink_cfg = sink_cfg or SinkConfig()
    stats = DeliveryStats()

    reader = (spark.readStream.format("text")
              .option("pathGlobFilter", cfg.glob))
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               cfg.max_files_per_trigger)
    lines = reader.load(cfg.watch_dir)

    wire = envelope_to_json(envelope_projection(lines, cfg.origin))

    writer = (wire.writeStream
              .foreachBatch(foreach_batch_sink(transport, sink_cfg, stats))
              .outputMode("append"))
    if cfg.checkpoint_dir:
        writer = writer.option("checkpointLocation", cfg.checkpoint_dir)
    if cfg.available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(
            processingTime=f"{cfg.flush_interval_s} seconds")
    return writer.start(), stats
