"""Bit-level helpers: slot packing and rank/select over bitvectors.

The reference stores 64 slots of ``bits_per_slot`` bits packed per block
(include/gqf_int.h:38-58; unaligned extraction in src/gqf.c:516-548) and
navigates with broadword rank/select (src/gqf.c:297-446).  Here slots live
unpacked in the narrowest numpy dtype that fits (the analog of the
reference's compile-time QF_BITS_PER_SLOT specialization, gqf_int.h:25-35)
and are bit-packed only on serialization, so the wire format keeps the
reference's space footprint while in-memory ops stay whole-array vectorized.

Rank/select runs on position arrays (``np.flatnonzero``) instead of per-word
broadword tricks — the batch-oriented equivalent: rank(q) =
``searchsorted(positions, q, 'right')`` and select(k) = ``positions[k-1]``.
"""

from __future__ import annotations

import numpy as np


def slot_dtype(bits_per_slot: int) -> np.dtype:
    """Narrowest unsigned dtype holding bits_per_slot-bit values."""
    if bits_per_slot <= 8:
        return np.dtype(np.uint8)
    if bits_per_slot <= 16:
        return np.dtype(np.uint16)
    if bits_per_slot <= 32:
        return np.dtype(np.uint32)
    return np.dtype(np.uint64)


def pack_slots(values: np.ndarray, bits_per_slot: int) -> bytes:
    """Pack values (< 2**bits_per_slot) into a little-endian bitstream.

    Word-gather formulation (1-D uint64 ops only): slot i's bits live at
    bit offset i*bps; each value ORs into its containing word and, when it
    straddles, spills its high bits into the next word.  The 2-D
    bit-matrix version (packbits over an (n, bps) expansion) is ~100x
    slower on large sketches.
    """
    assert 1 <= bits_per_slot <= 64
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if bits_per_slot < 64:
        v = v & np.uint64((1 << bits_per_slot) - 1)
    bitpos = np.arange(n, dtype=np.uint64) * np.uint64(bits_per_slot)
    wi = (bitpos >> np.uint64(6)).astype(np.int64)
    sh = bitpos & np.uint64(63)
    nbytes = (n * bits_per_slot + 7) // 8
    words = np.zeros(nbytes // 8 + 2, dtype=np.uint64)
    np.bitwise_or.at(words, wi, v << sh)
    # high bits spilling into the next word (sh==0 rows contribute nothing:
    # (64-sh)&63 == 0 there, and v>>0 is masked out by the where)
    spill = np.where(
        sh == 0, np.uint64(0), v >> ((np.uint64(64) - sh) & np.uint64(63))
    )
    np.bitwise_or.at(words, wi + 1, spill)
    return words.tobytes()[:nbytes]


def unpack_slots(data: bytes, n: int, bits_per_slot: int) -> np.ndarray:
    """Inverse of :func:`pack_slots`; returns the narrow-dtype slot array."""
    assert 1 <= bits_per_slot <= 64
    if n == 0:
        return np.empty(0, dtype=slot_dtype(bits_per_slot))
    raw = np.frombuffer(data, dtype=np.uint8)
    pad = (-raw.size) % 8 + 8  # slack word for straddling reads at the end
    raw = np.concatenate([raw, np.zeros(pad, dtype=np.uint8)])
    words = raw.view("<u8")
    bitpos = np.arange(n, dtype=np.uint64) * np.uint64(bits_per_slot)
    wi = (bitpos >> np.uint64(6)).astype(np.int64)
    sh = bitpos & np.uint64(63)
    lo = words[wi] >> sh
    hi = np.where(
        sh == 0,
        np.uint64(0),
        words[wi + 1] << ((np.uint64(64) - sh) & np.uint64(63)),
    )
    vals = lo | hi
    if bits_per_slot < 64:
        vals &= np.uint64((1 << bits_per_slot) - 1)
    return vals.astype(slot_dtype(bits_per_slot))


def bits_to_words(bit_positions: np.ndarray, nwords: int) -> np.ndarray:
    """Scatter set-bit positions into a uint64 word array (occupieds /
    runends bitvectors, include/gqf_int.h:42-43)."""
    words = np.zeros(nwords, dtype=np.uint64)
    if bit_positions.size:
        pos = np.ascontiguousarray(bit_positions, dtype=np.int64)
        np.bitwise_or.at(
            words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )
    return words


def words_to_bits(words: np.ndarray) -> np.ndarray:
    """Positions of set bits in a uint64 word array, ascending."""
    bits = np.unpackbits(
        np.ascontiguousarray(words, dtype=np.uint64).view(np.uint8),
        bitorder="little",
    )
    return np.flatnonzero(bits).astype(np.int64)


def popcount_words(words: np.ndarray) -> np.ndarray:
    """Per-word popcount (SWAR analog of the asm popcnt, src/gqf.c:265-272)."""
    v = np.ascontiguousarray(words, dtype=np.uint64)
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


def rank(positions: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """#set bits at position <= idx (reference bitrank, src/gqf.c:297-304),
    vectorized over a batch of query indices."""
    return np.searchsorted(positions, idx, side="right")


def select(positions: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Position of the k-th (1-indexed) set bit (reference _select64,
    src/gqf.c:323-424), vectorized; caller guarantees 1 <= k <= npositions."""
    return positions[np.asarray(k) - 1]
