"""Minimal PNG codec — pure stdlib (zlib + struct), no Pillow needed.

Exists so the multimodal operators can do REAL codec work in
environments without image libraries: PNG's container format is
public and simple (RFC 2083 / W3C PNG spec) — chunked layout,
zlib-compressed scanlines, five per-row predictor filters.  Scope is
deliberately narrow: 8-bit RGB / RGBA, non-interlaced — the shape
training-data image payloads are normalized to anyway.  Anything else
raises ``ValueError`` loudly (a corrupt or exotic blob must never
decode to garbage).

The encoder emits filter-0 rows (fastest, always valid); the decoder
implements all five filters, so PNGs produced by real-world encoders
(which pick filters per row) decode correctly.  Filter reconstruction
is sequential along a scanline by definition, so it runs as per-byte
Python over ``bytearray`` — fine for thumbnail-scale payloads; swap
in the Pillow path (``operators/multimodal.py``) for throughput on
large images.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHUNK_HDR = struct.Struct(">I4s")
_IHDR = struct.Struct(">IIBBBBB")

_COLOR_CHANNELS = {2: 3, 6: 4}       # RGB, RGBA


def encode_png(arr) -> bytes:
    """(h, w, 3|4) uint8 array → PNG bytes (8-bit, non-interlaced,
    filter-0 rows, single IDAT).  Deterministic for a fixed zlib."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError(f"expected (h, w, 3|4) uint8, got {a.shape}")
    h, w, ch = a.shape
    color_type = 2 if ch == 3 else 6
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (_CHUNK_HDR.pack(len(data), typ) + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    return (PNG_MAGIC
            + chunk(b"IHDR", _IHDR.pack(w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes):
    """PNG bytes → (h, w, channels) uint8 array.  Supports 8-bit
    RGB/RGBA non-interlaced with any row filters; raises ValueError on
    anything malformed or out of scope (CRC mismatch included)."""
    import numpy as np

    if blob[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated chunk header")
        length, typ = _CHUNK_HDR.unpack_from(blob, pos)
        data = blob[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(blob):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if crc != zlib.crc32(typ + data) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {typ!r}")
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = _IHDR.unpack(data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"color_type={color_type}); 8-bit RGB/RGBA only")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace mode")
    ch = _COLOR_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(f"scanline data: expected {h * (stride + 1)} "
                         f"bytes, got {len(raw)}")
    out = bytearray(h * stride)
    prior = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 0:
            pass
        elif f == 1:                                     # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:                                     # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif f == 3:                                     # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif f == 4:                                     # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prior[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f} on row {y}")
        out[y * stride:(y + 1) * stride] = line
        prior = line
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, ch)
