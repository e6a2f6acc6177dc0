"""Multimodal plumbing contract: schema, batch shape, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.operators.multimodal import (
    MEDIA_FEATURES,
    extract_media_features,
)


def _media_df(spark, n=10):
    rows = [(i, "image/fake", f"blob-{i}".encode() * (i + 1))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary")


def test_feature_schema_and_rowcount(spark):
    out = extract_media_features(_media_df(spark))
    assert out.schema == MEDIA_FEATURES
    assert out.count() == 10


def test_features_deterministic(spark):
    a = extract_media_features(_media_df(spark)).orderBy("doc_id").collect()
    b = extract_media_features(_media_df(spark)).orderBy("doc_id").collect()
    assert a == b


def test_checksum_matches_python(spark):
    import zlib
    out = {r.doc_id: r for r in
           extract_media_features(_media_df(spark)).collect()}
    assert out[0].checksum_crc32 == zlib.crc32(b"blob-0")
    assert out[0].n_bytes == 6
    assert 16 <= out[0].width <= 255 and 16 <= out[0].height <= 255


def test_partitioning_preserved(spark):
    """Feature extraction is a narrow map: input partitioning passes
    through, so decode parallelism = input partitions."""
    df = _media_df(spark, 64).repartition(8)
    out = extract_media_features(df)
    assert out.rdd.getNumPartitions() == 8
    assert out.agg(F.count("*")).collect()[0][0] == 64
