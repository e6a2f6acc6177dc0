"""Partitioned archival sink: the long-term store beside the delivery
sink.

The reference ships records to Kinesis and keeps nothing (a crash
loses the 5000-record buffer, reference main.go / SURVEY §3.2).  A
100 TB pipeline also lands an immutable columnar archive; this writer
lays it out the way downstream scans want it:

- partitioned by (event date, origin): partition pruning turns
  time-range + origin queries into directory listings;
- sized files via a pre-write repartition on the partition columns so
  each partition directory gets at most `files_per_partition` files
  (the small-files problem is a listing/Namenode killer at scale).

Works identically as a batch writer and inside foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def archive_envelopes(env: DataFrame, path: str,
                      files_per_partition: int = 4,
                      mode: str = "append") -> None:
    """Write Envelope rows (envelope_projection output) as partitioned
    parquet under ``path``."""
    dated = env.withColumn(
        "event_date",
        F.date_format(F.timestamp_micros(F.expr("timestamp DIV 1000")),
                      "yyyy-MM-dd"))
    (dated
     .repartition(files_per_partition, "event_date", "origin")
     .write
     .partitionBy("event_date", "origin")
     .mode(mode)
     .parquet(path))


def read_archive(spark, path: str) -> DataFrame:
    """Scan the archive; partition columns come back as columns and
    filters on them prune directories (asserted in tests)."""
    return spark.read.parquet(path)


def compact_archive(spark, src_path: str, dest_path: str,
                    files_per_partition: int = 1) -> None:
    """Rewrite an archive with ``files_per_partition`` files per
    partition directory.

    Streaming appends accumulate one file per micro-batch per
    partition; at scale that's the small-files problem (listing cost,
    tiny row groups, scheduler overhead).  Compaction writes to a NEW
    directory and the caller swaps it in — never read-and-overwrite
    the same location, which races the scan against file deletion.
    At 100 TB the swap is a metastore/view pointer flip; locally it's
    an ``os.rename``.
    """
    (spark.read.parquet(src_path)
     .repartition(files_per_partition, "event_date", "origin")
     .write
     .partitionBy("event_date", "origin")
     .mode("error")             # dest must be fresh: no silent merge
     .parquet(dest_path))
