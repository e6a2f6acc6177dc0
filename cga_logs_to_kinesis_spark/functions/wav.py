"""Minimal WAV (RIFF PCM) codec — stdlib only, the audio analogue of
``functions/png.py``.

Training-data audio pipelines normalize to PCM WAV early; the RIFF
container is public and simple, and Python's stdlib ``wave`` module is
a real, battle-tested codec for it — so the audio operators can do
REAL sample work in environments without ffmpeg/soundfile.  Scope:
16-bit PCM, any rate/channel count.  Anything else raises
``ValueError`` loudly (a corrupt or exotic blob must never decode to
garbage).
"""

from __future__ import annotations

import io
import wave

SAMPLE_WIDTH = 2          # 16-bit PCM only


def encode_wav(samples, rate: int) -> bytes:
    """(n, channels) int16 array → WAV bytes (16-bit PCM)."""
    import numpy as np

    a = np.ascontiguousarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[1] < 1:
        raise ValueError(f"expected (n, channels) int16, got {a.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(a.shape[1])
        w.setsampwidth(SAMPLE_WIDTH)
        w.setframerate(rate)
        w.writeframes(a.tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes):
    """WAV bytes → ((n, channels) int16 array, rate).  Raises
    ValueError on malformed input or non-16-bit-PCM encodings."""
    import numpy as np

    try:
        with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            comp = w.getcomptype()
            n = w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a readable WAV: {e}") from e
    if comp != "NONE":
        raise ValueError(f"unsupported WAV compression {comp!r}")
    if width != SAMPLE_WIDTH:
        raise ValueError(f"unsupported sample width {width} "
                         f"(16-bit PCM only)")
    if len(raw) != n * nch * SAMPLE_WIDTH:
        raise ValueError(f"truncated WAV data: expected "
                         f"{n * nch * SAMPLE_WIDTH} bytes, got {len(raw)}")
    return (np.frombuffer(raw, dtype="<i2").reshape(n, nch), rate)
