"""Pure-Python WAV (RIFF PCM) codec — upgrades the audio modality from
declared stub to real decode with zero new dependencies.

Scope: canonical RIFF/WAVE files with a PCM ``fmt `` chunk (format tag
1), 8- or 16-bit samples, any channel count and sample rate — the shape
a training-data pipeline actually ships after transcoding.  Compressed
formats (format tag != 1) and other bit depths raise ``ValueError``
(callers fall back to the declared stub for non-WAV/unsupported media).

Decode returns float32 PCM normalized to [-1, 1] shaped ``(n_samples,
n_channels)`` plus the sample rate; both directions are a single numpy
buffer cast, so the per-item cost is I/O-bound and parallelizes across
Arrow-batched ``mapInPandas`` workers (operators/multimodal.py).

Chunk walking follows the RIFF spec (word-aligned chunks, unknown
chunks skipped), so files carrying LIST/INFO metadata decode fine.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"
_WAVE_TAG = b"WAVE"


def is_wav(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == WAV_MAGIC and buf[8:12] == _WAVE_TAG


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """Encode PCM samples to canonical WAV bytes.

    ``samples``: float array in [-1, 1] (or int16/uint8 passed through),
    shape ``(n,)`` or ``(n, channels)``.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if bits == 16:
        if arr.dtype != np.int16:
            arr = np.clip(np.round(arr * 32767.0), -32768, 32767).astype(
                np.int16
            )
    elif bits == 8:
        if arr.dtype != np.uint8:
            arr = np.clip(np.round(arr * 127.5 + 127.5), 0, 255).astype(
                np.uint8
            )
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    data = arr.tobytes()  # interleaved little-endian, the WAV layout
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        _WAVE_TAG
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return WAV_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes -> (float32 PCM in [-1, 1], shape
    ``(n_samples, n_channels)``; sample_rate)."""
    if not is_wav(buf):
        raise ValueError("not a RIFF/WAVE buffer")
    pos, end = 12, len(buf)
    fmt = None
    data = None
    while pos + 8 <= end:
        ctype = buf[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + clen]
        if ctype == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif ctype == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _, _, bits = fmt
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        pcm = raw.astype(np.float32) / 32767.0
    elif bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        pcm = (raw.astype(np.float32) - 127.5) / 127.5
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n = pcm.size // channels
    return pcm[: n * channels].reshape(n, channels), rate
