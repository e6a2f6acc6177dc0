"""Stdlib PNG codec: round-trips, all five decode filters, loud
failure on malformed input, cross-codec parity, and the (Pillow-gated)
interoperability check."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cga_logs_to_kinesis_spark.functions.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
)


def _gradient(h, w, ch=3):
    """Deterministic synthetic image: per-channel gradients."""
    y = np.arange(h, dtype=np.uint16)[:, None]
    x = np.arange(w, dtype=np.uint16)[None, :]
    planes = [(y * 3 + x * 5 + c * 17) % 256 for c in range(ch)]
    return np.stack(planes, axis=-1).astype(np.uint8)


def test_roundtrip_rgb_and_rgba():
    for ch in (3, 4):
        arr = _gradient(13, 7, ch)
        back = decode_png(encode_png(arr))
        assert back.shape == arr.shape
        assert (back == arr).all()


def test_roundtrip_random_pixels_and_extreme_sizes():
    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (1, 64), (64, 1), (32, 32)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(arr)) == arr).all()


def _manual_png(arr, filters):
    """Encode with caller-chosen per-row filter types — produces the
    scanline layouts real-world encoders emit (our encoder always
    writes filter 0, so decode of filters 1-4 needs hand-built files)."""
    h, w, ch = arr.shape
    prior = np.zeros(w * ch, dtype=np.int16)
    out = b""
    for y in range(h):
        recon = arr[y].reshape(-1).astype(np.int16)
        f = filters[y]
        left = np.concatenate([np.zeros(ch, np.int16), recon[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int16), prior[:-ch]])
        if f == 0:
            filt = recon
        elif f == 1:
            filt = recon - left
        elif f == 2:
            filt = recon - prior
        elif f == 3:
            filt = recon - ((left + prior) >> 1)
        elif f == 4:
            p = left + prior - ul
            pa, pb, pc = (abs(p - left), abs(p - prior), abs(p - ul))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, ul))
            filt = recon - pred
        out += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
        prior = recon

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(out)) + chunk(b"IEND", b""))


def test_decode_all_filter_types():
    """Every PNG predictor filter (None/Sub/Up/Average/Paeth) must
    reconstruct exactly — real-world encoders mix them per row."""
    arr = _gradient(10, 6)
    for f in (0, 1, 2, 3, 4):
        blob = _manual_png(arr, [f] * 10)
        assert (decode_png(blob) == arr).all(), f"filter {f}"
    # mixed filters, the realistic case
    blob = _manual_png(arr, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert (decode_png(blob) == arr).all()


def test_decode_rejects_malformed():
    arr = _gradient(4, 4)
    good = encode_png(arr)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG!" + good[8:])
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[20] ^= 0xFF                      # flip a byte inside IHDR
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:30])                # truncated
    # 16-bit depth is out of scope and must say so, not misdecode
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    blob = (PNG_MAGIC + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="unsupported|missing"):
        decode_png(blob)


def test_decode_image_probe_order():
    """decode_image: PNG decodes without Pillow; non-PNG without
    Pillow fails loudly (NotImplementedError), never fakes."""
    from cga_logs_to_kinesis_spark.operators.multimodal import decode_image

    arr = _gradient(5, 9)
    assert (decode_image(encode_png(arr)) == arr).all()
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present: non-PNG formats decode for real")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\xff\xd8\xff\xe0totally-a-jpeg")


def test_features_query_parity_with_raw_path(spark):
    """multimodal_features (PNG codec) and multimodal_raw_features
    (raw codec) decode identically-seeded pixel arrays: dims and exact
    channel means must agree doc-for-doc — two codecs, one truth."""
    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    specs = all_queries()
    png = {r.doc_id: r for r in
           specs["multimodal_features"].fn(spark, SF_SMOKE).collect()}
    raw = {r.doc_id: r for r in
           specs["multimodal_raw_features"].fn(spark, SF_SMOKE).collect()}
    assert set(png) == set(raw) and len(png) >= 100
    for doc_id, p in png.items():
        r = raw[doc_id]
        assert (p.width, p.height) == (r.width, r.height)
        assert (p.mean_r, p.mean_g, p.mean_b) == (
            r.mean_r, r.mean_g, r.mean_b)


def test_resize_query_real_dims(spark):
    """multimodal_resize reports dimensions obtained by re-decoding
    the emitted thumbnail: aspect-preserving, bounded by max_side."""
    from cga_logs_to_kinesis_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["multimodal_resize"].fn(
        spark, SF_SMOKE).limit(50).collect()
    assert rows
    for r in rows:
        src_w = 8 + r.doc_id % 25
        src_h = 8 + (r.doc_id // 3) % 25
        scale = 16 / max(src_w, src_h)
        assert r.width == max(1, int(src_w * scale))
        assert r.height == max(1, int(src_h * scale))


def test_pillow_interop():
    """When Pillow IS available: it must decode our encodes to the
    same pixels, and we must decode its encodes (gated like the
    spark-protobuf jar test; skipped where Pillow is absent)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    arr = _gradient(11, 17)
    with Image.open(io.BytesIO(encode_png(arr))) as im:
        assert (np.asarray(im.convert("RGB")) == arr).all()
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    assert (decode_png(buf.getvalue()) == arr).all()
