"""Multimodal plumbing contract: schema, batch shape, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_logs_to_kinesis_spark.functions.png import encode_png
from cga_logs_to_kinesis_spark.operators.multimodal import (
    MEDIA_FEATURES,
    extract_media_features,
)


def _png_blob(i: int) -> bytes:
    import numpy as np
    rng = np.random.default_rng(i)
    arr = rng.integers(0, 256, size=(4 + i % 5, 3 + i % 7, 3),
                       dtype=np.uint8)
    return encode_png(arr)


def _media_df(spark, n=10):
    rows = [(i, "image/png", bytearray(_png_blob(i))) for i in range(n)]
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


def test_checksum_and_dims_match_python(spark):
    import zlib
    out = {r.doc_id: r for r in
           extract_media_features(_media_df(spark)).collect()}
    blob0 = _png_blob(0)
    assert out[0].checksum_crc32 == zlib.crc32(blob0)
    assert out[0].n_bytes == len(blob0)
    # seeded dims: (h, w) = (4 + 0 % 5, 3 + 0 % 7) — real header decode
    assert (out[0].width, out[0].height) == (3, 4)


def test_partitioning_preserved(spark):
    """Feature extraction is a narrow map: input partitioning passes
    through, so decode parallelism = input partitions."""
    df = _media_df(spark, 64).repartition(8)
    out = extract_media_features(df)
    assert out.rdd.getNumPartitions() == 8
    assert out.agg(F.count("*")).collect()[0][0] == 64


# -- RAW-format path: real pixel math, exactness pinned by hand ------------

def test_raw_roundtrip_and_exact_means():
    """Encode a hand-built 2x2 image, decode it back, and check the
    fixed-point channel means against hand-computed values."""
    import numpy as np

    from cga_logs_to_kinesis_spark.operators.multimodal import (
        decode_raw_image,
        encode_raw_image,
    )

    arr = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    blob = encode_raw_image(arr)
    assert blob[:8] == (2).to_bytes(4, "big") * 2        # w=2, h=2
    back = decode_raw_image(blob)
    assert (back == arr).all()
    # channel sums: r=510, g=510, b=510 over 4 px -> mean 127.5
    sums = arr.reshape(-1, 3).sum(axis=0)
    assert list(sums) == [510, 510, 510]


def test_raw_features_query_exact(spark):
    """End-to-end raw decode: widths/heights follow the seeding
    formula and means equal an independent numpy recomputation."""
    import numpy as np

    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = {r.doc_id: r for r in
            all_queries()["multimodal_raw_features"]
            .fn(spark, SF_SMOKE).limit(50).collect()}
    for doc_id, r in list(rows.items())[:10]:
        assert r.width == 8 + doc_id % 25
        assert r.height == 8 + (doc_id // 3) % 25
        # independent recomputation: the pixel-hash formula inlined,
        # not imported, so a generator regression can't self-confirm
        i = np.arange(r.width * r.height * 3, dtype=np.int64)
        d = int(doc_id) % 1000003
        px = (d * 2654435761 + i * 40503 + (i * i) % 65521) % 256
        arr = px.astype(np.uint8).reshape(r.height, r.width, 3)
        sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        n = r.width * r.height
        assert r.mean_r == int(sums[0]) * 1_000_000 // n
        assert r.mean_g == int(sums[1]) * 1_000_000 // n
        assert r.mean_b == int(sums[2]) * 1_000_000 // n


def test_raw_resize_nearest_neighbor_exact(spark):
    """Nearest-neighbor semantics pinned on a 4x4 checkerboard resized
    to 2x2: output pixel (x, y) must equal source (x*w//2, y*h//2)."""
    import numpy as np

    from cga_logs_to_kinesis_spark.operators.multimodal import (
        decode_raw_image,
        encode_raw_image,
        resize_raw,
    )

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[::2, ::2] = 255          # checkerboard corners
    media = spark.createDataFrame(
        [(1, bytearray(encode_raw_image(arr)))],
        "doc_id long, payload binary")
    [row] = resize_raw(media, out_w=2, out_h=2).collect()
    small = decode_raw_image(bytes(row.payload))
    # (x*4//2, y*4//2) -> rows/cols 0 and 2 of the source
    expect = arr[np.ix_([0, 2], [0, 2])]
    assert (small == expect).all()


def test_raw_decode_rejects_truncated_blob():
    import pytest

    from cga_logs_to_kinesis_spark.operators.multimodal import (
        decode_raw_image,
    )

    with pytest.raises(ValueError, match="expected"):
        decode_raw_image((3).to_bytes(4, "big") * 2 + b"\x00" * 5)


# -- Audio path: stdlib WAV codec, integer-exact features ------------------

def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from cga_logs_to_kinesis_spark.functions.wav import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    for nch in (1, 2):
        a = rng.integers(-32768, 32768, size=(100, nch), dtype=np.int16)
        back, rate = decode_wav(encode_wav(a, 16000))
        assert rate == 16000
        assert back.shape == (100, nch)
        assert (back == a).all()


def test_wav_decode_rejects_malformed():
    import numpy as np
    import pytest

    from cga_logs_to_kinesis_spark.functions.wav import (
        decode_wav,
        encode_wav,
    )

    with pytest.raises(ValueError, match="WAV"):
        decode_wav(b"RIFFgarbage-not-a-wave-file")
    good = encode_wav(
        np.zeros((10, 1), dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(good[:30])               # truncated header/data


def test_audio_features_query_exact(spark):
    """End-to-end WAV decode: every feature equals an independent
    numpy recomputation from the seeded samples."""
    import numpy as np

    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["multimodal_audio_features"].fn(
        spark, SF_SMOKE).limit(30).collect()
    assert rows
    for r in rows[:10]:
        d = r.doc_id
        n, nch = 400 + d % 800, 1 + d % 2
        rate = (8000, 16000, 44100)[d % 3]
        # independent recomputation: the PCM-hash formula inlined
        j = np.arange(n * nch, dtype=np.int64)
        dd = int(d) % 1000003
        v = (dd * 48271 + j * 16807 + (j * j) % 32749) % 65536 - 32768
        a = v.astype(np.int16).reshape(n, nch).astype(np.int64)
        assert (r.n_samples, r.n_channels, r.sample_rate) == (n, nch, rate)
        assert r.duration_us == n * 1_000_000 // rate
        assert r.peak == int(np.abs(a).max())
        assert r.mean_square_x1e6 == int((a * a).sum()) * 1_000_000 \
            // (n * nch)
        ch0 = a[:, 0]
        assert r.zero_crossings == int(
            (np.signbit(ch0[1:]) != np.signbit(ch0[:-1])).sum())


# --- video (MPNG container) path ------------------------------------------

def test_mpng_container_roundtrip_and_seek():
    """encode → iter must return exactly the sampled frames' bytes,
    and the sampler must honor the length index (every_nth skip)."""
    import numpy as np

    from cga_logs_to_kinesis_spark.functions.png import decode_png
    from cga_logs_to_kinesis_spark.operators.multimodal import (
        encode_mpng, iter_mpng_frames)

    frames = [np.random.default_rng(i).integers(
        0, 256, size=(5, 7, 3), dtype=np.uint8) for i in range(9)]
    blob = encode_mpng(frames)
    got = list(iter_mpng_frames(blob, every_nth=4))
    assert [i for i, _ in got] == [0, 4, 8]
    for i, png in got:
        assert (decode_png(png) == frames[i]).all()


def test_mpng_rejects_bad_magic():
    import pytest

    from cga_logs_to_kinesis_spark.operators.multimodal import (
        iter_mpng_frames)
    with pytest.raises(ValueError):
        list(iter_mpng_frames(b"XXXX\x00\x00\x00\x00"))


def test_video_frames_query_exact(spark):
    """The registered query's output must equal a local recomputation
    from the same seeds: real decode, exact integer channel sums, and
    ceil(12/3)=4 frames per document."""
    import hashlib

    import numpy as np

    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    out = (all_queries()["multimodal_video_frames"]
           .fn(spark, SF_SMOKE).filter(F.col("doc_id") < 6).collect())
    assert len(out) == 6 * 4
    for r in out:
        d, i = r.doc_id, r.frame_index
        assert i % 3 == 0
        w, h = 6 + d % 9, 6 + (d // 2) % 9
        # independent recomputation: pixel-hash formula inlined
        j = np.arange(w * h * 3, dtype=np.int64)
        seed = (d * 1000 + i) % 1000003
        px = (seed * 2654435761 + j * 40503 + (j * j) % 65521) % 256
        arr = px.astype(np.uint8).reshape(h, w, 3)
        s = arr.astype(np.int64).sum(axis=(0, 1))
        assert (r.width, r.height) == (w, h)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(v) for v in s)
        assert r.frame_digest == hashlib.md5(
            arr.tobytes().hex().encode()).hexdigest()


# -- Image near-dup dedup: dHash over planted scenes -----------------------

def test_image_dhash_brightness_invariant_and_near_miss():
    """The perceptual property the family rests on, pinned in pure
    Python: within a planted group, variant 2 (uniform +2 brightness)
    hashes IDENTICALLY to variant 0, and variant 1 (brightness +1 plus
    the single-pixel override) lands within Hamming 1 — while the
    group's variant-3 distinct scene is far away."""
    import numpy as np

    from cga_logs_to_kinesis_spark.operators.multimodal import (
        IMG_BAND_BITS,
        IMG_BANDS,
        decode_raw_image,
        make_raw_media_scenes,  # noqa: F401 — fixture twin under test
        _scene_seed,
        IMG_PIX_LEVELS,
        PIX_A, PIX_B, PIX_C, PIX_M,
        encode_raw_image,
    )

    def blob(doc_id: int) -> bytes:
        seed = _scene_seed(doc_id)
        v = doc_id % 4
        w, h = 8 + seed % 25, 8 + (seed // 3) % 25
        i = np.arange(w * h * 3, dtype=np.int64)
        base = ((seed % PIX_M) * PIX_A + i * PIX_B
                + (i * i) % PIX_C) % IMG_PIX_LEVELS
        arr = (base + (0 if v == 3 else v)).astype(np.uint8)
        if v == 1:
            arr[0] = 255
        return encode_raw_image(arr.reshape(h, w, 3))

    def dhash_bits(b: bytes):
        arr = decode_raw_image(b)
        h, w = arr.shape[0], arr.shape[1]
        ys, xs = (np.arange(8) * h) // 8, (np.arange(9) * w) // 9
        g = arr[np.ix_(ys, xs)].astype(np.int64).sum(axis=2)
        return (g[:, 1:] > g[:, :-1]).ravel()

    assert IMG_BANDS * IMG_BAND_BITS == 64
    for group in (0, 7, 31):
        v0, v1, v2, v3 = (dhash_bits(blob(group * 4 + v))
                          for v in range(4))
        assert (v0 == v2).all()                    # brightness-invariant
        assert (v0 != v1).sum() <= 1               # controlled near-miss
        assert (v0 != v3).sum() > 3                # distinct scene is far


def test_image_dhash_rejects_truncated_blob(spark):
    """Dirty-net: a truncated or odd-size payload must fail the
    fingerprint stage loudly (decode_raw_image's length check), never
    hash garbage into the dedup graph."""
    import pytest

    from cga_logs_to_kinesis_spark.operators.multimodal import (
        image_dhash,
    )

    good = (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + b"\x01" * 18
    for bad in (good[:-5],                      # truncated body
                good + b"\x00\x00\x00"):        # trailing junk
        media = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(bad))],
            "doc_id long, payload binary")
        with pytest.raises(Exception, match="expected"):
            image_dhash(media).collect()


def test_fused_media_stages_match_unfused(spark):
    """The fused generate+consume mapInPandas paths (optimization
    r18: payloads born and consumed inside one Python worker, never
    crossing the JVM boundary) must be row-for-row identical to the
    unfused operator pairs they compose — same batch callables, so
    this pins the composition wiring."""
    from cga_logs_to_kinesis_spark.operators.multimodal import (
        audio_features,
        image_dhash,
        make_raw_media,
        make_raw_media_scenes,
        make_wav_media,
        raw_features,
        resize_raw,
        scene_dhash_fingerprints,
    )
    from cga_logs_to_kinesis_spark.registry import all_queries
    from cga_logs_to_kinesis_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(scene_dhash_fingerprints(docs)) == \
        rows(image_dhash(make_raw_media_scenes(docs)))
    assert rows(all_queries()["multimodal_raw_features"].fn(spark, sf)) == \
        rows(raw_features(make_raw_media(docs)).orderBy("doc_id"))
    assert rows(all_queries()["multimodal_raw_resize"].fn(spark, sf)) == \
        rows(raw_features(resize_raw(make_raw_media(docs)))
             .orderBy("doc_id"))
    assert rows(all_queries()["multimodal_audio_features"].fn(spark, sf)) \
        == rows(audio_features(make_wav_media(docs)).orderBy("doc_id"))
