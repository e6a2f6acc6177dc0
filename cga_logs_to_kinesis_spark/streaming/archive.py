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


def _salted_repartition(df: DataFrame, n: int, *part_cols: str) -> DataFrame:
    """Shuffle so each (part_cols) group spreads over at most ``n``
    tasks → at most ``n`` files per partition directory.

    A plain ``repartition(n, *part_cols)`` does NOT do this: all rows
    of one group share a hash and land in ONE task, so every partition
    directory gets exactly one file and a hot partition writes through
    a single straw.  Salting with a deterministic row hash (stable
    across task retries, unlike monotonically_increasing_id) fans each
    group out to ``n`` writers.

    The shuffle width is passed explicitly (session shuffle.partitions)
    — an implicit-width ``repartition(cols)`` is fair game for AQE
    partition coalescing, which at low volume would merge the salted
    spread straight back into one writer.
    """
    width = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n))
    return (df.withColumn("_salt", salt)
            .repartition(width, *part_cols, "_salt")
            .drop("_salt"))


def archive_envelopes(env: DataFrame, path: str,
                      files_per_partition: int = 4,
                      mode: str = "append") -> None:
    """Write Envelope rows (envelope_projection output) as partitioned
    parquet under ``path``."""
    dated = env.withColumn(
        "event_date",
        F.date_format(F.timestamp_micros(F.expr("timestamp DIV 1000")),
                      "yyyy-MM-dd"))
    (_salted_repartition(dated, files_per_partition,
                         "event_date", "origin")
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
    (_salted_repartition(spark.read.parquet(src_path),
                         files_per_partition, "event_date", "origin")
     .write
     .partitionBy("event_date", "origin")
     .mode("error")             # dest must be fresh: no silent merge
     .parquet(dest_path))
