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
import struct
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



# ---------------------------------------------------------------------------
# Resize / frame-sample stubs: the remaining media-pipeline stages.
# Real codecs are absent in this container; the Spark-side contract
# (schemas, Arrow batching, partition inheritance) is real and tested.
# ---------------------------------------------------------------------------

RESIZED = StructType([
    StructField("doc_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("thumb_digest", StringType(), False),
])

FRAMES = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("frame_digest", StringType(), False),
])


def resize_media(media: DataFrame, max_side: int = 64) -> DataFrame:
    """STUB resize: deterministic fake downscale preserving aspect
    ratio; a real implementation decodes + resamples here."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [_fake_decode(bytes(b)) for b in pdf["payload"]]
            out_w, out_h, digests = [], [], []
            for (w, h), blob in zip(dims, pdf["payload"]):
                scale = max_side / max(w, h)
                nw = max(1, int(w * scale))
                nh = max(1, int(h * scale))
                out_w.append(nw)
                out_h.append(nh)
                digests.append(hashlib.md5(
                    bytes(blob) + f"{nw}x{nh}".encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.Series(out_w, dtype="int32"),
                "height": pd.Series(out_h, dtype="int32"),
                "thumb_digest": digests,
            })

    return media.mapInPandas(batches, schema=RESIZED)


def sample_frames(media: DataFrame, every_nth: int = 10,
                  frames_per_blob: int = 100) -> DataFrame:
    """STUB frame sampler: emits every Nth frame index with a
    deterministic per-frame digest — the row-expansion shape of video
    decode (1 blob -> many frames), which is why it must run
    executor-side and never collect."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, digs = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, frames_per_blob, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    digs.append(hashlib.md5(
                        bytes(blob) + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_index": pd.Series(idxs, dtype="int32"),
                "frame_digest": digs,
            })

    return media.mapInPandas(batches, schema=FRAMES)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"))
    return resize_media(media).orderBy("doc_id")


register(QuerySpec(
    "multimodal_resize", q_multimodal_resize,
    oracle=None,
    doc="media resize stage (stub decode; real Arrow/mapInPandas shape)",
    tags=("multimodal", "north-star", "pandas-udf"),
))


# ---------------------------------------------------------------------------
# RAW-format path: REAL decode / features / resize, no codec libs.
# ---------------------------------------------------------------------------
# Codec formats (JPEG/PNG/...) need Pillow etc., absent here — but a
# raw self-describing format needs only numpy, which IS available.
# Payload = 8-byte big-endian header (width, height) + width*height*3
# interleaved RGB bytes.  Everything below is real pixel math: header
# parse, channel statistics, nearest-neighbor resample.  Swapping the
# payload parser for a codec decode is the only change needed for
# JPEG/PNG — the Spark topology (Arrow batches, row expansion
# executor-side, digest-only shuffles) is identical.

RAW_HEADER = struct.Struct(">II")

RAW_FEATURES = StructType([
    StructField("doc_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("mean_r", LongType(), False),   # x1e6 fixed-point
    StructField("mean_g", LongType(), False),
    StructField("mean_b", LongType(), False),
])


def encode_raw_image(arr) -> bytes:
    """(h, w, 3) uint8 array → raw payload."""
    h, w = arr.shape[0], arr.shape[1]
    return RAW_HEADER.pack(w, h) + arr.tobytes()


def decode_raw_image(blob: bytes):
    """Raw payload → (h, w, 3) uint8 array.  Raises on malformed
    input — a corrupt blob must fail loudly, not decode garbage."""
    import numpy as np
    w, h = RAW_HEADER.unpack(blob[:RAW_HEADER.size])
    body = blob[RAW_HEADER.size:]
    if len(body) != w * h * 3:
        raise ValueError(f"raw image: expected {w * h * 3} bytes, "
                         f"got {len(body)}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def make_raw_media(docs: DataFrame) -> DataFrame:
    """Deterministic raw-RGB fixture blobs: dimensions and pixels are
    seeded from doc_id, so every run (and both sides of any
    comparison) sees identical payloads."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                rng = np.random.default_rng(int(doc_id))
                w = 8 + int(doc_id) % 25
                h = 8 + (int(doc_id) // 3) % 25
                arr = rng.integers(0, 256, size=(h, w, 3),
                                   dtype=np.uint8)
                payloads.append(encode_raw_image(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return (media_schema_df(docs)
            .mapInPandas(batches, schema="doc_id long, payload binary"))


def media_schema_df(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id")


def raw_features(media: DataFrame) -> DataFrame:
    """Real per-channel means from decoded pixels.  Means are emitted
    as x1e6 fixed-point integers: the mean of uint8s is an exact
    rational (sum/count in int64), and fixed-point keeps the output
    float-free so any downstream comparison is exact."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "width": [], "height": [],
                    "mean_r": [], "mean_g": [], "mean_b": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_raw_image(bytes(blob))
                h, w = arr.shape[0], arr.shape[1]
                sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                n = w * h
                for ch, key in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[key].append(int(sums[ch]) * 1_000_000 // n)
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "mean_r": pd.Series(rows["mean_r"], dtype="int64"),
                "mean_g": pd.Series(rows["mean_g"], dtype="int64"),
                "mean_b": pd.Series(rows["mean_b"], dtype="int64"),
            })

    return media.mapInPandas(batches, schema=RAW_FEATURES)


def resize_raw(media: DataFrame, out_w: int = 16,
               out_h: int = 16) -> DataFrame:
    """Real nearest-neighbor resample via numpy index arithmetic —
    source pixel for output (x, y) is (x*w//out_w, y*h//out_h).
    Emits the resized payload (still raw format) plus its digest."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads, digests = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_raw_image(bytes(blob))
                h, w = arr.shape[0], arr.shape[1]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                small = arr[np.ix_(ys, xs)]
                out = encode_raw_image(small)
                ids.append(doc_id)
                payloads.append(out)
                digests.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": payloads,
                "thumb_digest": digests,
            })

    return media.mapInPandas(
        batches, schema="doc_id long, payload binary, thumb_digest string")


def q_multimodal_raw_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate raw blobs → decode → channel stats.  Rows-only in the
    driver gate (pixel data is not SQL-reproducible); exactness is
    pinned by tests/test_multimodal.py against hand-computed pixels."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return raw_features(make_raw_media(docs)).orderBy("doc_id")


register(QuerySpec(
    "multimodal_raw_features", q_multimodal_raw_features,
    oracle=None,
    doc="REAL raw-RGB decode + exact channel means (numpy, no codec "
        "libs needed)",
    tags=("multimodal", "north-star", "pandas-udf"),
))


def q_multimodal_raw_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_raw(make_raw_media(docs))
    return (raw_features(resized)
            .orderBy("doc_id"))


register(QuerySpec(
    "multimodal_raw_resize", q_multimodal_raw_resize,
    oracle=None,
    doc="REAL nearest-neighbor resize, verified by re-decoding the "
        "resized payloads",
    tags=("multimodal", "north-star", "pandas-udf"),
))
