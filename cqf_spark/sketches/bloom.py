"""Bloom filter (Bloom 1970) with Kirsch-Mitzenmacher double hashing:
bit_i = (h1 + i*h2) mod m for i in 0..k-1, preserving the classic
false-positive rate (1 - e^{-kn/m})^k with only two base hashes.

No false negatives ever; merge = bitwise OR over equal geometries.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..functions.hashing import murmur64a_u64
from .base import Sketch


class BloomFilter(Sketch):
    TYPE_TAG = 3

    def __init__(
        self,
        m_bits_log2: int = 20,
        k: int = 7,
        seed: int = 0xB100,
        words: np.ndarray | None = None,
        n_added: int = 0,
    ):
        if not 6 <= m_bits_log2 <= 36 or not 1 <= k <= 16:
            raise ValueError("bad bloom geometry")
        self.m_bits_log2 = m_bits_log2
        self.m = 1 << m_bits_log2
        self.k = k
        self.seed = seed
        self.words = (
            words if words is not None else np.zeros(self.m >> 6, dtype=np.uint64)
        )
        self.n_added = n_added

    @classmethod
    def for_capacity(cls, n: int, fp_rate: float = 0.01, seed: int = 0xB100):
        """Size for n distinct keys at the target FP rate:
        m = -n ln p / ln^2 2 (rounded up to a power of two), k = m/n ln 2."""
        m_exact = -n * np.log(fp_rate) / (np.log(2) ** 2)
        mlog2 = max(6, int(np.ceil(np.log2(max(m_exact, 64)))))
        k = max(1, min(16, round((1 << mlog2) / max(n, 1) * np.log(2))))
        return cls(mlog2, int(k), seed)

    def _bit_positions(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        h1 = murmur64a_u64(h, self.seed)
        h2 = murmur64a_u64(h, self.seed + 1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) & np.uint64(self.m - 1)).astype(
            np.int64
        )  # (k, n)

    def update(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        if hashes.size == 0:
            return
        pos = self._bit_positions(hashes).ravel()
        np.bitwise_or.at(
            self.words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        )
        self.n_added += int(hashes.size)

    def merge(self, other: "Sketch") -> "BloomFilter":
        self._check_merge(other)
        assert isinstance(other, BloomFilter)
        return BloomFilter(
            self.m_bits_log2,
            self.k,
            self.seed,
            self.words | other.words,
            self.n_added + other.n_added,
        )

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.empty(0, dtype=bool)
        pos = self._bit_positions(hashes)  # (k, n)
        bits = (
            self.words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=0)

    def expected_fp_rate(self, n_distinct: int | None = None) -> float:
        """(1 - e^{-kn/m})^k with n defaulting to insertions (upper bound,
        since duplicates only re-set the same bits)."""
        n = self.n_added if n_distinct is None else n_distinct
        return float((1.0 - np.exp(-self.k * n / self.m)) ** self.k)

    def _header(self) -> dict[str, Any]:
        # n_added intentionally excluded: it is state, not geometry
        return {"m_bits_log2": self.m_bits_log2, "k": self.k, "seed": self.seed}

    def _payload(self) -> list[np.ndarray]:
        return [self.words, np.array([self.n_added], dtype=np.int64)]

    @classmethod
    def _from_parts(cls, header: dict[str, Any], buf: memoryview) -> "BloomFilter":
        mlog2 = int(header["m_bits_log2"])
        nwords = (1 << mlog2) >> 6
        words = np.frombuffer(buf, dtype=np.uint64, count=nwords).copy()
        n_added = int(
            np.frombuffer(buf, dtype=np.int64, count=1, offset=nwords * 8)[0]
        )
        return cls(mlog2, int(header["k"]), int(header["seed"]), words, n_added)
