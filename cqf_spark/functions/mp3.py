"""Pure-Python MP3 frame DEMUX — upgrades the mp3 modality from
declared stub to real container parsing with zero new dependencies.

Scope is demux, not decode: frame boundaries, per-frame header fields,
sample-accurate duration and average bitrate come from walking the
frame headers (4 bytes each, bitrate/samplerate from the spec tables);
the MDCT audio payload itself stays undecoded (that genuinely needs a
codec library and remains the declared stub).  This is the same honesty
layering as Y4M (full decode) vs MP4 (demux): the training-pipeline
operators that need "how many frames / how long / where do frames
start" get real answers.

Covers MPEG-1/2/2.5 Layer III (and Layer II/I framing), ID3v2 tag
skipping (syncsafe length) and padding bits.  A synthesizer builds
valid frame sequences for the tests, which verify offsets/durations
against pen-and-paper arithmetic.
"""

from __future__ import annotations

import numpy as np

# bitrate kbps tables, index 1..14 (0 = free, 15 = bad) — ISO 11172-3
_BITRATE = {
    # (version_group, layer): row  — version_group: 1 = MPEG1, 2 = MPEG2/2.5
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
             384],
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
             256],
}
_SAMPLERATE = {
    3: [44100, 48000, 32000],   # MPEG1   (version bits 11)
    2: [22050, 24000, 16000],   # MPEG2   (version bits 10)
    0: [11025, 12000, 8000],    # MPEG2.5 (version bits 00)
}
_SAMPLES_PER_FRAME = {
    # (version_group, layer) -> samples
    (1, 1): 384, (1, 2): 1152, (1, 3): 1152,
    (2, 1): 384, (2, 2): 1152, (2, 3): 576,
}

MP3_SYNC = 0xFFE0


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit length)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    ss = data[6:10]
    return 10 + ((ss[0] & 0x7F) << 21 | (ss[1] & 0x7F) << 14
                 | (ss[2] & 0x7F) << 7 | (ss[3] & 0x7F))


def is_mp3(data: bytes) -> bool:
    """True only for a CHAINED stream: the first frame's length must land
    exactly on a second valid header (or end-of-buffer) — a lone 0xFFEx
    byte pair in random binary must not claim the mp3 dispatch."""
    data = bytes(data)
    off = _id3v2_size(data)
    h = _parse_header(data, off)
    if h is None:
        return False
    nxt = off + h[0]
    return nxt == len(data) or _parse_header(data, nxt) is not None


def _parse_header(data: bytes, off: int):
    """(frame_len, samples, sample_rate, bitrate_kbps) or None."""
    if off + 4 > len(data):
        return None
    b0, b1, b2, _b3 = data[off : off + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 0x3   # 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
    layer_bits = (b1 >> 1) & 0x3     # 3=L1 2=L2 1=L3 0=reserved
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    vgroup = 1 if version_bits == 3 else 2
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _BITRATE[(vgroup, layer)][br_idx] * 1000
    sr = _SAMPLERATE[version_bits][sr_idx]
    samples = _SAMPLES_PER_FRAME[(vgroup, layer)]
    if layer == 1:
        flen = (12 * bitrate // sr + padding) * 4
    else:
        # Layer II/III: coefficient = samples/8
        flen = samples // 8 * bitrate // sr + padding
    if flen < 4:
        return None
    return flen, samples, sr, bitrate // 1000


def demux_mp3(data: bytes) -> dict:
    """Walk the frame chain: returns ``{n_frames, duration_s,
    sample_rate, avg_bitrate_kbps, frame_offsets (np.int64)}``.
    Raises ``ValueError`` if no valid frame chain is found."""
    data = bytes(data)
    off = _id3v2_size(data)
    offsets, total_samples, kbps_sum, sr = [], 0, 0, None
    while off + 4 <= len(data):
        h = _parse_header(data, off)
        if h is None:
            if not offsets:
                raise ValueError("not an MP3 frame chain")
            break  # trailing garbage / ID3v1 tag: stop at chain end
        flen, samples, this_sr, kbps = h
        if sr is None:
            sr = this_sr
        elif this_sr != sr:
            break  # a different stream glued on: stop
        offsets.append(off)
        total_samples += samples
        kbps_sum += kbps
        off += flen
    if not offsets:
        raise ValueError("not an MP3 frame chain")
    return {
        "n_frames": len(offsets),
        "duration_s": round(total_samples / sr, 6),
        "sample_rate": sr,
        "avg_bitrate_kbps": round(kbps_sum / len(offsets), 3),
        "frame_offsets": np.asarray(offsets, dtype=np.int64),
    }


def synth_mp3(
    n_frames: int, br_idx: int = 9, sr_idx: int = 0, mpeg1: bool = True,
    id3: bytes = b"", seed: int = 0
) -> bytes:
    """Valid Layer-III frame chain with deterministic filler payloads —
    the test-side synthesizer (alternates the padding bit so both frame
    lengths occur)."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    if id3:
        n = len(id3)
        out += b"ID3\x04\x00\x00" + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        ) + id3
    version_bits = 3 if mpeg1 else 2
    for i in range(n_frames):
        padding = i & 1
        b1 = 0xE0 | (version_bits << 3) | (1 << 1) | 1  # layer III
        b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        hdr = bytes([0xFF, b1, b2, 0xC0])
        vgroup = 1 if mpeg1 else 2
        bitrate = _BITRATE[(vgroup, 3)][br_idx] * 1000
        sr = _SAMPLERATE[version_bits][sr_idx]
        samples = _SAMPLES_PER_FRAME[(vgroup, 3)]
        flen = samples // 8 * bitrate // sr + padding
        out += hdr + bytes(rng.integers(0, 256, flen - 4, dtype=np.uint8))
    return bytes(out)
