"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the media itself is an opaque
``binary`` column (or a pointer column to object storage) with a typed
metadata struct beside it; decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` stages so each task processes a whole
batch of blobs without row-at-a-time Python overhead.

The actual codec libraries (Pillow/ffmpeg/etc.) are not in this
container, so the decode step is a clearly marked deterministic fake —
the Spark-side contract (schema, batch shape, partitioning) is real
and tested; swap ``_fake_decode`` for a real decoder to productionize.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cga_logs_to_kinesis_spark.registry import QuerySpec, register
from cga_logs_to_kinesis_spark.session import tune_session
from cga_logs_to_kinesis_spark.sources import load_table

# Output contract of the feature-extraction stage.
MEDIA_FEATURES = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("checksum_crc32", LongType(), False),
    StructField("content_digest", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """STUB decoder: deterministic pseudo-dimensions from the payload.

    A real implementation would decode the image header here (Pillow,
    libvips, ...).  Raising NotImplementedError would also satisfy the
    contract; the fake keeps the pipeline executable end-to-end.
    """
    h = hashlib.sha256(blob).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, payload).

    One Arrow batch in, one pandas frame out — vectorized transport,
    per-blob decode.  Partitioning is inherited from the input scan, so
    decode parallelism = input partitions (tune with repartition before
    this stage if blobs are few and large).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["payload"]
            dims = [_fake_decode(bytes(b)) for b in blobs]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": blobs.map(len).astype("int64"),
                "checksum_crc32": blobs.map(
                    lambda b: zlib.crc32(bytes(b))).astype("int64"),
                "content_digest": blobs.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": pd.Series([d[0] for d in dims], dtype="int32"),
                "height": pd.Series([d[1] for d in dims], dtype="int32"),
            })

    return media.mapInPandas(batches, schema=MEDIA_FEATURES)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-encoded as a binary payload stands in for media
    blobs; checksum/digest are real, width/height come from the stub
    decoder (non-SQL-expressible → rows-only correctness check)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return extract_media_features(media).orderBy("doc_id")


register(QuerySpec(
    "multimodal_features", q_multimodal_features,
    oracle=None,  # stubbed decode: genuinely non-SQL-expressible
    doc="binary media column + mapInPandas feature extraction (stub decode)",
    tags=("multimodal", "north-star", "pandas-udf"),
))
