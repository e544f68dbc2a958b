"""Pure-Python YUV4MPEG2 (.y4m) demuxer — upgrades the video modality
from declared stub to real frame demux with zero new dependencies.

Y4M is the canonical uncompressed video interchange container (mjpegtools
spec): one ASCII stream header ``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<cs>``
followed by frames, each an ASCII ``FRAME`` header line plus raw planes.
Supported colorspaces: ``Cmono`` (one Y plane per frame) and ``C420``
family (Y + quarter-size U,V) — decode returns the LUMA plane per frame
shaped ``(n_frames, h, w)`` uint8, which is what frame-sampling feature
extraction consumes.  Other colorspaces raise ``ValueError`` (callers
fall back to the declared stub for non-Y4M/unsupported media).

Demux is pure pointer arithmetic over the buffer (frame payloads are
fixed-size), so sampling every n-th frame touches only the sampled
frames' bytes — the container seek a real pipeline needs at 100 TB.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "


def is_y4m(buf: bytes) -> bool:
    return len(buf) >= 10 and buf[:10] == Y4M_MAGIC


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), colorspace: str = "mono"
) -> bytes:
    """Encode uint8 luma frames ``(n, h, w)`` to Y4M bytes.  ``C420``
    writes flat U/V planes (128) so real decoders render it gray."""
    arr = np.asarray(frames, dtype=np.uint8)
    n, h, w = arr.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    out = [head.encode("ascii")]
    uv = (
        np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
        if colorspace.startswith("420")
        else b""
    )
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(arr[i].tobytes())
        out.append(uv)
        out.append(uv)
    return b"".join(out)


def _parse_header(buf: bytes) -> tuple[int, int, str, int]:
    """-> (width, height, colorspace, offset past the stream header)."""
    if not is_y4m(buf):
        raise ValueError("not a YUV4MPEG2 buffer")
    nl = buf.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M stream header")
    w = h = None
    cs = "420"  # spec default when the C tag is absent
    for tok in buf[10:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"C":
            cs = val.decode("ascii")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    return w, h, cs, nl + 1


def y4m_frame_geometry(buf: bytes) -> tuple[int, int, int, int, int]:
    """-> (width, height, frame_payload_bytes, first_frame_offset,
    n_frames).  Payload size is fixed per stream, so frame k's luma
    plane starts at ``first + k * (len('FRAME\\n') + payload)`` — O(1)
    seek, no scan."""
    w, h, cs, pos = _parse_header(buf)
    if cs == "mono":
        payload = w * h
    elif cs.startswith("420"):
        payload = w * h + 2 * ((h // 2) * (w // 2))
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    stride = 6 + payload  # b"FRAME\n" + planes
    n = (len(buf) - pos) // stride
    return w, h, payload, pos, n


def decode_y4m(buf: bytes, every_nth: int = 1) -> np.ndarray:
    """Demux luma planes -> uint8 ``(n_sampled, h, w)``, taking every
    n-th frame (0, n, 2n, ...) without touching skipped frames' bytes."""
    w, h, _payload, pos, n = y4m_frame_geometry(buf)
    stride = 6 + _payload
    idx = range(0, n, every_nth)
    out = np.empty((len(idx), h, w), dtype=np.uint8)
    raw = np.frombuffer(buf, dtype=np.uint8)
    for row, k in enumerate(idx):
        start = pos + k * stride
        if buf[start : start + 6] != b"FRAME\n":
            raise ValueError(f"corrupt FRAME header at frame {k}")
        out[row] = raw[start + 6 : start + 6 + w * h].reshape(h, w)
    return out
