"""Pure-Python baseline JPEG codec (numpy DCT + canonical Huffman) —
upgrades JPEG image cells from declared stub to real decode with zero
new dependencies.

Decoder scope: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
any sampling factors with integer upsample ratios (covers 4:4:4, 4:2:2,
4:2:0 and grayscale — what cameras and thumbnailers actually emit),
restart markers honored.  Huffman and quantization tables are read from
the stream's DHT/DQT segments (as the spec requires), so third-party
baseline JPEGs decode, not just our own.  Progressive (SOF2), arithmetic
coding, and 12-bit precision raise ``ValueError`` (callers fall back to
the declared stub).

Encoder (the test harness, also spec-compliant output): 4:4:4, 4:2:0 or
grayscale, custom canonical Huffman tables built from the actual symbol
distribution (every symbol at one code length L with 2**L > n_symbols,
so the all-ones code is never issued) and a deterministic ramp
quantization table — both carried in the stream per the format, so any
baseline decoder reads the output.

JPEG is lossy: round-trip tests assert exact recovery for solid blocks
and bounded error (quant-table-determined) for smooth content.

Performance shape: DCT/IDCT are one einsum over all blocks; Huffman
decode walks bits per symbol through a 16-bit prefix LUT (one numpy
table per DHT).  Per-image cost parallelizes across Arrow-batched
``mapInPandas`` workers (operators/multimodal.py), the same contract as
PNG/WAV/Y4M.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"


def is_jpeg(buf: bytes) -> bool:
    return len(buf) >= 3 and buf[:3] == JPEG_MAGIC


# --------------------------------------------------------------------- #
# shared tables
# --------------------------------------------------------------------- #

def _zigzag() -> np.ndarray:
    """The spec's zigzag scan as (row, col) pairs, generated (not
    transcribed): diagonals s = r+c, odd diagonals walk down-left."""
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rows = rng if s % 2 else reversed(rng)
        order.extend((r, s - r) for r in rows)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]  # zigzag position -> flat block index

_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    _C[_u] = _a * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16.0)

# deterministic ramp quantization tables (any 1..255 values are legal;
# the stream carries them, so decoders never assume these)
_Q_LUMA = (1 + (np.arange(8)[:, None] + np.arange(8)[None, :])) * 2 + 2
_Q_CHROMA = (1 + (np.arange(8)[:, None] + np.arange(8)[None, :])) * 3 + 3


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ur,nrc,vc->nuv", _C, blocks, _C, optimize=True)


def _idct2(coefs: np.ndarray) -> np.ndarray:
    # B = C.T @ X @ C: subscripts place C as C[u, r] / C[v, c]
    return np.einsum("ur,nuv,vc->nrc", _C, coefs, _C, optimize=True)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------- #
# bit I/O
# --------------------------------------------------------------------- #

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, byte2: int) -> None:
        """Byte-align and emit a raw (unstuffed) marker, e.g. RSTn."""
        self.align()
        self.out += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops (raises ``_MarkerHit``) at a real marker."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt, self.pos)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_and_expect_rst(self, which: int) -> None:
        """Consume padding to a byte boundary and the RSTn marker."""
        self.nbits = 0
        self.acc = 0
        if self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] != (
            0xD0 + which
        ):
            raise ValueError("missing restart marker")
        self.pos += 2


class _MarkerHit(Exception):
    def __init__(self, marker: int, pos: int) -> None:
        self.marker = marker
        self.pos = pos


# --------------------------------------------------------------------- #
# canonical Huffman
# --------------------------------------------------------------------- #

class _HuffDecoder:
    """16-bit prefix LUT from a DHT's (BITS, HUFFVAL): one lookup yields
    (symbol, code length) for any next-16-bits window."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        self.sym = np.zeros(1 << 16, dtype=np.int16) - 1
        self.len = np.zeros(1 << 16, dtype=np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.sym[lo:hi] = values[k]
                self.len[lo:hi] = length
                code += 1
                k += 1
            code <<= 1

    def decode(self, rd: _BitReader) -> int:
        # peek up to 16 bits without committing (fill as available)
        while rd.nbits < 16:
            try:
                rd._fill()
            except (_MarkerHit, IndexError):
                break
        if rd.nbits >= 16:
            window = (rd.acc >> (rd.nbits - 16)) & 0xFFFF
        else:
            window = (rd.acc << (16 - rd.nbits)) & 0xFFFF
        length = int(self.len[window])
        if length == 0 or length > rd.nbits:
            raise ValueError("invalid Huffman code in entropy stream")
        sym = int(self.sym[window])
        rd.bits(length)
        return sym


def _build_encoder_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Uniform-length canonical code over the emitted symbols: length L
    with 2**L > n keeps the all-ones code unused (spec's generator
    guarantees decodability)."""
    vals = sorted(symbols) or [0]
    n = len(vals)
    length = max(n.bit_length(), 1)
    if (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    code = {v: (i, length) for i, v in enumerate(vals)}
    return bits, bytes(vals), code


# --------------------------------------------------------------------- #
# encoder
# --------------------------------------------------------------------- #

def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8) in raster block order, edge-padded."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    return (
        plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8),
        hb,
        wb,
    )


def _quantize_plane(plane: np.ndarray, q: np.ndarray):
    blocks, hb, wb = _blocks_of(plane.astype(np.float64) - 128.0)
    coefs = np.round(_dct2(blocks) / q).astype(np.int64)
    return coefs, hb, wb


def _encode_coef_stream(comp_coefs, mcus, restart_every):
    """-> (dc symbols set, ac symbols set, per-MCU token lists).

    ``mcus``: per MCU, the list of (comp_idx, block_idx) to emit.
    Tokens: ('dc'/'ac', table_class, symbol, extra_bits, n_extra)."""
    dc_syms: set[int] = set()
    ac_syms: dict[int, set[int]] = {0: set(), 1: set()}
    mcu_tokens = []
    prev_dc = [0] * len(comp_coefs)
    for m, interleave in enumerate(mcus):
        if restart_every and m and m % restart_every == 0:
            prev_dc = [0] * len(comp_coefs)  # RSTn resets DC prediction
        tokens = []
        for ci, bi in interleave:
            zz = comp_coefs[ci][bi].reshape(64)[_ZZ_FLAT]
            tci = 0 if ci == 0 else 1  # table class: luma / chroma
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            t = 0 if diff == 0 else abs(diff).bit_length()
            extra = diff if diff >= 0 else diff + (1 << t) - 1
            dc_syms.add(t)
            tokens.append(("dc", tci, t, extra, t))
            run = 0
            ac = zz[1:]
            nz = np.flatnonzero(ac)
            last = nz[-1] + 1 if nz.size else 0
            for v in ac[:last]:
                v = int(v)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms[tci].add(0xF0)
                    tokens.append(("ac", tci, 0xF0, 0, 0))
                    run -= 16
                s = abs(v).bit_length()
                sym = (run << 4) | s
                ac_syms[tci].add(sym)
                extra = v if v >= 0 else v + (1 << s) - 1
                tokens.append(("ac", tci, sym, extra, s))
                run = 0
            if last < 63:
                ac_syms[tci].add(0x00)
                tokens.append(("ac", tci, 0x00, 0, 0))
        mcu_tokens.append(tokens)
    return dc_syms, ac_syms, mcu_tokens


def encode_jpeg(
    arr: np.ndarray, subsampling: str = "444", restart_every: int = 0
) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB to baseline JPEG.
    ``subsampling``: '444' or '420' (color only).  ``restart_every`` > 0
    emits a DRI segment and RSTn markers every that many MCUs."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        if subsampling == "420":
            ph, pw = -h % 2, -w % 2
            ycc_p = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
            cb = ycc_p[:, :, 1].reshape(
                ycc_p.shape[0] // 2, 2, ycc_p.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            cr = ycc_p[:, :, 2].reshape(
                ycc_p.shape[0] // 2, 2, ycc_p.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            planes = [ycc[:, :, 0], cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qts = [_Q_LUMA] + ([] if gray else [_Q_CHROMA])

    # quantize each component; pad plane so block grid covers whole MCUs
    comp_coefs, comp_dims = [], []
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        need_h, need_w = mcuy * 8 * sv, mcux * 8 * sh
        plane = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        coefs, hb, wb = _quantize_plane(plane, qts[min(ci, 1)])
        comp_coefs.append(coefs)
        comp_dims.append((hb, wb))

    # MCU interleave order
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            interleave = []
            for ci, (sh, sv) in enumerate(samp):
                _, wb = comp_dims[ci]
                for by in range(sv):
                    for bx in range(sh):
                        interleave.append(
                            (ci, (my * sv + by) * wb + mx * sh + bx)
                        )
            mcus.append(interleave)
    dc_syms, ac_syms, mcu_tokens = _encode_coef_stream(
        comp_coefs, mcus, restart_every
    )

    dc_bits, dc_vals, dc_code = _build_encoder_table(dc_syms)
    ac_tabs = {
        t: _build_encoder_table(ac_syms[t])
        for t in ([0] if gray else [0, 1])
    }
    wr = _BitWriter()
    rst = 0
    for m, toks in enumerate(mcu_tokens):
        if restart_every and m and m % restart_every == 0:
            wr.marker(0xD0 + rst % 8)
            rst += 1
        for kind, tci, sym, extra, nbits in toks:
            if kind == "dc":
                c, length = dc_code[sym]
            else:
                c, length = ac_tabs[tci][2][sym]
            wr.write(c, length)
            if nbits:
                wr.write(extra, nbits)
    scan = wr.flush()

    # ---- marker segments ----
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )
    for qi, q in enumerate(qts):
        out.append(
            seg(
                0xFFDB,
                bytes([qi])
                + bytes(q.reshape(64)[_ZZ_FLAT].astype(np.uint8).tolist()),
            )
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    out.append(seg(0xFFC0, sof))
    out.append(seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + dc_vals))
    for t, (bits, vals, _) in ac_tabs.items():
        out.append(seg(0xFFC4, bytes([0x10 | t]) + bytes(bits) + vals))
    if restart_every:
        out.append(seg(0xFFDD, struct.pack(">H", restart_every)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (0x00 << 4) | min(ci, 1)])
    sos += bytes([0, 63, 0])
    out.append(seg(0xFFDA, sos))
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# --------------------------------------------------------------------- #
# decoder
# --------------------------------------------------------------------- #

def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes -> uint8 array, (h, w) for grayscale
    or (h, w, 3) RGB."""
    if not is_jpeg(buf):
        raise ValueError("not a JPEG buffer")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue  # standalone
        (ln,) = struct.unpack_from(">H", buf, pos)
        body = buf[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.float64)
                tab[_ZZ_FLAT] = np.frombuffer(
                    body[o + 1 : o + 65], dtype=np.uint8
                )
                qt[tq] = tab.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = body[o + 17 : o + 17 + n]
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, *range(0xC5, 0xC8), *range(0xC9, 0xCC)):
            raise ValueError("progressive/arithmetic JPEG unsupported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scomps.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(buf, pos, frame, scomps, qt, huff, restart)
    raise ValueError("no scan data found")


def _decode_scan(buf, pos, frame, scomps, qt, huff, restart):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scomps)
    vmax = max(c["v"] for c, _, _ in scomps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    rd = _BitReader(buf, pos)
    comp_coefs = []
    comp_wb = []
    for c, _, _ in scomps:
        hb, wb = mcuy * c["v"], mcux * c["h"]
        comp_coefs.append(np.zeros((hb * wb, 64), dtype=np.float64))
        comp_wb.append(wb)
    prev_dc = [0] * len(scomps)
    n_mcu = mcux * mcuy
    rst_count = 0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            rd.align_and_expect_rst(rst_count % 8)
            rst_count += 1
            prev_dc = [0] * len(scomps)
        my, mx = divmod(m, mcux)
        for ci, (c, td, ta) in enumerate(scomps):
            dc_dec = huff[(0, td)]
            ac_dec = huff[(1, ta)]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.float64)
                    t = dc_dec.decode(rd)
                    if t:
                        v = rd.bits(t)
                        if v < (1 << (t - 1)):
                            v -= (1 << t) - 1
                    else:
                        v = 0
                    prev_dc[ci] += v
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        sym = ac_dec.decode(rd)
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        v = rd.bits(size)
                        if v < (1 << (size - 1)):
                            v -= (1 << size) - 1
                        zz[k] = v
                        k += 1
                    bi = (my * c["v"] + by) * comp_wb[ci] + mx * c["h"] + bx
                    comp_coefs[ci][bi] = zz
    # dequantize + IDCT per component, reassemble planes, upsample
    planes = []
    for ci, (c, _, _) in enumerate(scomps):
        hb, wb = mcuy * c["v"], comp_wb[ci]
        blocks = np.zeros((hb * wb, 8, 8))
        blocks.reshape(-1, 64)[:, _ZZ_FLAT] = comp_coefs[ci]
        blocks *= qt[c["tq"]]
        pix = _idct2(blocks) + 128.0
        plane = (
            pix.reshape(hb, wb, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(hb * 8, wb * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer chroma upsample ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    return np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
