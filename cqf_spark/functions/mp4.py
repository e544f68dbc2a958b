"""Pure-Python MP4/ISO-BMFF DEMUX — upgrades the mp4 modality from
declared stub to real container parsing with zero new dependencies.

Scope is demux, not decode: the box tree (ftyp/moov/trak/mdia/minf/stbl)
is walked and the sample tables inverted — ``stts`` (durations),
``stsz`` (sizes), ``stsc`` (samples per chunk), ``stco``/``co64``
(chunk offsets) — into per-sample (offset, size, decode-time), which is
exactly what frame sampling needs: every sample's bytes are addressable
and timestamped without decoding them.  The H.264/H.265 payload stays
undecoded (that genuinely needs a codec library and remains the
declared stub).

A synthesizer builds minimal valid files for the tests, which verify
recovered offsets/sizes/timestamps byte-for-byte against the planted
``mdat`` payloads.  Reference: ISO/IEC 14496-12 (public spec).
"""

from __future__ import annotations

import struct

import numpy as np

MP4_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1")


def is_mp4(data: bytes) -> bool:
    return (
        len(data) >= 12
        and data[4:8] == b"ftyp"
        and data[8:12] in MP4_BRANDS
    )


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) of the sibling boxes in
    [start, end); handles 64-bit largesize boxes."""
    off = start
    while off + 8 <= end:
        size = struct.unpack(">I", data[off : off + 4])[0]
        btype = data[off + 4 : off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", data[off + 8 : off + 16])[0]
            body = off + 16
        elif size == 0:  # to end of enclosing box
            size = end - off
        if size < 8 or off + size > end:
            raise ValueError(f"malformed box {btype!r} at {off}")
        yield btype, body, off + size
        off += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box at the given nested path; None if absent."""
    if not path:
        return start, end
    for btype, b, e in _boxes(data, start, end):
        if btype == path[0]:
            return _find(data, b, e, *path[1:])
    return None


def demux_mp4(data: bytes) -> dict:
    """First video (or sole) track's samples: ``{n_samples, duration_s,
    timescale, offsets, sizes, times_s}`` (numpy arrays; ``times_s`` are
    decode times).  Raises ``ValueError`` on malformed tables."""
    data = bytes(data)
    if not is_mp4(data):
        raise ValueError("not an MP4 (no ftyp with a known brand)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    chosen = None
    for btype, b, e in _boxes(data, *moov):
        if btype != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        handler = data[hdlr[0] + 8 : hdlr[0] + 12] if hdlr else b"????"
        if chosen is None or handler == b"vide":
            chosen = (mdia, handler)
        if handler == b"vide":
            break
    if chosen is None:
        raise ValueError("no track")
    mdia, _handler = chosen
    mdhd = _find(data, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError("no mdhd")
    version = data[mdhd[0]]
    timescale = struct.unpack(
        ">I", data[mdhd[0] + (20 if version else 12) :][:4]
    )[0]
    stbl = _find(data, *mdia, b"minf", b"stbl")
    if stbl is None:
        raise ValueError("no sample table")

    def table(name: bytes):
        t = _find(data, *stbl, name)
        return t

    # stts: (count, delta) runs -> per-sample decode times
    stts = table(b"stts")
    if stts is None:
        raise ValueError("no stts")
    n_runs = struct.unpack(">I", data[stts[0] + 4 : stts[0] + 8])[0]
    runs = np.frombuffer(
        data, dtype=">u4", count=2 * n_runs, offset=stts[0] + 8
    ).reshape(n_runs, 2)
    deltas = np.repeat(runs[:, 1], runs[:, 0]).astype(np.int64)
    times = np.concatenate(([0], np.cumsum(deltas)[:-1]))
    n = int(runs[:, 0].sum())

    # stsz: sizes (fixed or per-sample)
    stsz = table(b"stsz")
    if stsz is None:
        raise ValueError("no stsz")
    fixed, count = struct.unpack(">II", data[stsz[0] + 4 : stsz[0] + 12])
    if count != n:
        raise ValueError(f"stsz count {count} != stts samples {n}")
    sizes = (
        np.full(n, fixed, dtype=np.int64)
        if fixed
        else np.frombuffer(
            data, dtype=">u4", count=n, offset=stsz[0] + 12
        ).astype(np.int64)
    )

    # stco/co64: chunk offsets
    stco = table(b"stco")
    if stco is not None:
        n_chunks = struct.unpack(">I", data[stco[0] + 4 : stco[0] + 8])[0]
        chunk_offs = np.frombuffer(
            data, dtype=">u4", count=n_chunks, offset=stco[0] + 8
        ).astype(np.int64)
    else:
        co64 = table(b"co64")
        if co64 is None:
            raise ValueError("no stco/co64")
        n_chunks = struct.unpack(">I", data[co64[0] + 4 : co64[0] + 8])[0]
        chunk_offs = np.frombuffer(
            data, dtype=">u8", count=n_chunks, offset=co64[0] + 8
        ).astype(np.int64)

    # stsc: samples-per-chunk runs -> chunk of each sample
    stsc = table(b"stsc")
    if stsc is None:
        raise ValueError("no stsc")
    n_ent = struct.unpack(">I", data[stsc[0] + 4 : stsc[0] + 8])[0]
    ent = np.frombuffer(
        data, dtype=">u4", count=3 * n_ent, offset=stsc[0] + 8
    ).reshape(n_ent, 3)  # (first_chunk 1-based, samples_per_chunk, sdidx)
    per_chunk = np.empty(n_chunks, dtype=np.int64)
    for i in range(n_ent):
        first = int(ent[i, 0]) - 1
        last = int(ent[i + 1, 0]) - 1 if i + 1 < n_ent else n_chunks
        per_chunk[first:last] = int(ent[i, 1])
    if per_chunk.sum() != n:
        raise ValueError("stsc/stts sample count mismatch")

    # offsets: within each chunk, samples are contiguous from its base
    offsets = np.empty(n, dtype=np.int64)
    si = 0
    for c in range(n_chunks):
        k = int(per_chunk[c])
        ss = sizes[si : si + k]
        offsets[si : si + k] = chunk_offs[c] + np.concatenate(
            ([0], np.cumsum(ss)[:-1])
        )
        si += k
    duration = float((times[-1] + deltas[-1]) / timescale) if n else 0.0
    return {
        "n_samples": n,
        "timescale": int(timescale),
        "duration_s": round(duration, 6),
        "offsets": offsets,
        "sizes": sizes,
        "times_s": np.round(times / timescale, 6),
    }


# --------------------------------------------------------------------- #
# synthesizer (tests): minimal valid single-track file
# --------------------------------------------------------------------- #


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def synth_mp4(
    sample_payloads: list, timescale: int = 1000, delta: int = 40,
    samples_per_chunk: int = 3, handler: bytes = b"vide"
) -> bytes:
    """Minimal ISO-BMFF file whose mdat holds ``sample_payloads``
    verbatim, chunked ``samples_per_chunk`` at a time — recovered
    offsets/sizes must slice the payloads back byte-identically."""
    n = len(sample_payloads)
    sizes = [len(p) for p in sample_payloads]
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(sample_payloads)
    # layout: ftyp | mdat | moov — chunk offsets need mdat's position
    mdat_body_off = len(ftyp) + 8
    chunk_offs, si = [], 0
    while si < n:
        chunk_offs.append(mdat_body_off + sum(sizes[:si]))
        si += samples_per_chunk
    stts = _box(b"stts", struct.pack(">II", 0, 1)
                + struct.pack(">II", n, delta))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, n)
                + b"".join(struct.pack(">I", s) for s in sizes))
    rem = n % samples_per_chunk
    if rem == 0:
        stsc_entries = [(1, samples_per_chunk, 1)]
    elif len(chunk_offs) == 1:  # a single short chunk
        stsc_entries = [(1, rem, 1)]
    else:
        stsc_entries = [
            (1, samples_per_chunk, 1), (len(chunk_offs), rem, 1)
        ]
    stsc = _box(b"stsc", struct.pack(">II", 0, len(stsc_entries))
                + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stco = _box(b"stco", struct.pack(">II", 0, len(chunk_offs))
                + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stsd = _box(b"stsd", struct.pack(">II", 0, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, timescale,
                                     n * delta, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + handler
                + b"\x00" * 12 + b"h\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    mvhd = _box(b"mvhd", b"\x00" * 100)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
