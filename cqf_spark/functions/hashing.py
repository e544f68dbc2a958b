"""Bit-exact, numpy-vectorized ports of the reference hash family.

The reference hashes with MurmurHash64A (src/hashutil.c:23-64) in DEFAULT
mode and Thomas Wang's bijective ``hash_64``/``hash_64i``
(src/hashutil.c:132-181) in INVERTIBLE mode (dispatch at src/gqf.c:1918-1924).
Spark's built-in ``xxhash64``/``hash`` are different functions; byte-identical
hashes are required to reproduce the reference's false-positive behavior and
to cross-validate sketches, so these are implemented as pure uint64 numpy
arithmetic (wrapping mul/xor/shift) — vectorized over whole Arrow batches,
no per-row Python.
"""

from __future__ import annotations

import numpy as np

_M = np.uint64(0xC6A4A7935BD1E995)
_R = np.uint64(47)

_U64 = np.uint64


def murmur64a_u64(keys: np.ndarray, seed: int) -> np.ndarray:
    """MurmurHash64A of each key's 8-byte little-endian representation.

    Matches the reference's ``MurmurHash64A(&key, sizeof(key), seed)``
    (src/gqf.c:1920, src/hashutil.c:23-64): len=8 -> exactly one 8-byte body
    chunk, no tail.
    """
    k = np.ascontiguousarray(keys, dtype=np.uint64)
    init = (seed ^ ((8 * 0xC6A4A7935BD1E995) & 0xFFFFFFFFFFFFFFFF)) & 0xFFFFFFFFFFFFFFFF
    h = np.full(k.shape, _U64(init), dtype=np.uint64)
    kk = k * _M
    kk ^= kk >> _R
    kk *= _M
    h ^= kk
    h *= _M
    h ^= h >> _R
    h *= _M
    h ^= h >> _R
    return h


def murmur64a_bytes(data: list[bytes] | np.ndarray, seed: int) -> np.ndarray:
    """MurmurHash64A over variable-length byte strings, vectorized.

    Semantics identical to src/hashutil.c:23-64 for any length: 8-byte LE
    body chunks, then the 0-7 byte tail folded with the switch fallthrough
    (h ^= byte[t] << 8t for t < len&7, then h *= m once if the tail is
    non-empty), then the 3-step finalizer.
    """
    if isinstance(data, np.ndarray) and data.dtype != object:
        data = list(data)
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in data), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    # pad every row to a whole number of 8-byte words (>= 8)
    width = max(8, ((max_len + 7) // 8) * 8)
    padded = np.zeros((n, width), dtype=np.uint8)
    flat = np.frombuffer(b"".join(data), dtype=np.uint8)
    if flat.size:
        row_idx = np.repeat(np.arange(n), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        col_idx = np.arange(flat.size) - np.repeat(starts, lens)
        padded[row_idx, col_idx] = flat
    words = padded.view("<u8")  # (n, width//8)

    m = _M
    h = _U64(seed) ^ (lens.astype(np.uint64) * m)
    nchunks = lens // 8
    for j in range(words.shape[1]):
        active = nchunks > j
        if not active.any():
            break
        k = words[:, j].copy()
        k *= m
        k ^= k >> _R
        k *= m
        h = np.where(active, (h ^ k) * m, h)

    tail_len = (lens & 7).astype(np.int64)
    if (tail_len > 0).any():
        tail_start = (nchunks * 8).astype(np.int64)
        acc = np.zeros(n, dtype=np.uint64)
        rows = np.arange(n)
        for t in range(7):
            active = tail_len > t
            if not active.any():
                break
            b = np.zeros(n, dtype=np.uint64)
            idx = np.minimum(tail_start + t, width - 1)
            b[active] = padded[rows[active], idx[active]].astype(np.uint64)
            acc ^= b << _U64(8 * t)
        h = np.where(tail_len > 0, (h ^ acc) * m, h)

    h ^= h >> _R
    h *= m
    h ^= h >> _R
    return h


def hash_64(keys: np.ndarray, mask: int) -> np.ndarray:
    """Thomas Wang's bijective 64-bit hash (src/hashutil.c:132-142).

    A bijection on [0, mask+1) for mask = 2**k - 1, so INVERTIBLE-mode
    sketches have no false positives within key_bits.
    """
    mk = _U64(mask)
    key = np.ascontiguousarray(keys, dtype=np.uint64)
    key = (~key + (key << _U64(21))) & mk
    key = key ^ (key >> _U64(24))
    key = ((key + (key << _U64(3))) + (key << _U64(8))) & mk  # key * 265
    key = key ^ (key >> _U64(14))
    key = ((key + (key << _U64(2))) + (key << _U64(4))) & mk  # key * 21
    key = key ^ (key >> _U64(28))
    key = (key + (key << _U64(31))) & mk
    return key


def hash_64i(keys: np.ndarray, mask: int) -> np.ndarray:
    """Inverse of :func:`hash_64` (src/hashutil.c:146-181)."""
    mk = _U64(mask)
    key = np.ascontiguousarray(keys, dtype=np.uint64)

    # Invert key = key + (key << 31)
    tmp = key - (key << _U64(31))
    key = (key - (tmp << _U64(31))) & mk

    # Invert key = key ^ (key >> 28)
    tmp = key ^ (key >> _U64(28))
    key = key ^ (tmp >> _U64(28))

    # Invert key *= 21
    key = (key * _U64(14933078535860113213)) & mk

    # Invert key = key ^ (key >> 14)
    tmp = key ^ (key >> _U64(14))
    tmp = key ^ (tmp >> _U64(14))
    tmp = key ^ (tmp >> _U64(14))
    key = key ^ (tmp >> _U64(14))

    # Invert key *= 265
    key = (key * _U64(15244667743933553977)) & mk

    # Invert key = key ^ (key >> 24)
    tmp = key ^ (key >> _U64(24))
    key = key ^ (tmp >> _U64(24))

    # Invert key = (~key) + (key << 21)
    tmp = ~key
    tmp = ~(key - (tmp << _U64(21)))
    tmp = ~(key - (tmp << _U64(21)))
    key = ~(key - (tmp << _U64(21))) & mk
    return key


def fingerprint_bytes(data: bytes, seed: int = 0) -> int:
    """Fast 64-bit content fingerprint of one (possibly large) byte string.

    NOT the reference Murmur (which chains words sequentially and so can't
    vectorize over a single long input); this hashes all 8-byte words in
    one vectorized murmur64a_u64 pass keyed by position parity via an
    index mix, then xor-folds.  Used for checkpoint lineage validation
    (corruption detection), where any well-mixed hash suffices.
    """
    n = len(data)
    pad = (-n) % 8
    arr = np.frombuffer(data + b"\0" * pad, dtype="<u8")
    if arr.size == 0:
        return int(murmur64a_u64(np.array([n], dtype=np.uint64), seed)[0].astype(np.int64))
    mixed = murmur64a_u64(arr + np.arange(arr.size, dtype=np.uint64), seed ^ n)
    return int(np.bitwise_xor.reduce(mixed).astype(np.int64))
