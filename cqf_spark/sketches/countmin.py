"""Count-Min sketch (Cormode & Muthukrishnan 2005).

Point-query guarantee: ``true <= est`` always, and
``est <= true + e/width * N`` with probability ``1 - e^-depth`` per key.
Merge = elementwise table addition (associative, commutative).

Row hashes are independent Murmur64A instances (seed + row index), each
masked into the power-of-two width — one vectorized hash per row over the
whole batch.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..functions.hashing import murmur64a_u64
from .base import Sketch


class CountMinSketch(Sketch):
    TYPE_TAG = 2

    def __init__(
        self,
        depth: int = 4,
        width_bits: int = 16,
        seed: int = 0x5EED,
        table: np.ndarray | None = None,
    ):
        if depth < 1 or not 4 <= width_bits <= 30:
            raise ValueError("bad count-min geometry")
        self.depth = depth
        self.width_bits = width_bits
        self.width = 1 << width_bits
        self.seed = seed
        self.table = (
            table
            if table is not None
            else np.zeros((depth, self.width), dtype=np.int64)
        )

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        mask = np.uint64(self.width - 1)
        return np.stack(
            [
                (murmur64a_u64(h, self.seed + i) & mask).astype(np.int64)
                for i in range(self.depth)
            ]
        )  # (depth, n)

    def update(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        if hashes.size == 0:
            return
        c = (
            counts.astype(np.int64)
            if counts is not None
            else np.ones(hashes.size, dtype=np.int64)
        )
        idx = self._indices(hashes)
        for i in range(self.depth):
            np.add.at(self.table[i], idx[i], c)

    def merge(self, other: "Sketch") -> "CountMinSketch":
        self._check_merge(other)
        assert isinstance(other, CountMinSketch)
        return CountMinSketch(
            self.depth, self.width_bits, self.seed, self.table + other.table
        )

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Point estimates (min across rows) for a batch of hashed keys."""
        if hashes.size == 0:
            return np.empty(0, dtype=np.int64)
        idx = self._indices(hashes)
        ests = np.stack(
            [self.table[i][idx[i]] for i in range(self.depth)]
        )
        return ests.min(axis=0)

    @property
    def total(self) -> int:
        """Stream length N (row sums are all N by construction)."""
        return int(self.table[0].sum())

    def error_bound(self) -> float:
        """Additive overestimate bound e*N/width (holds per key w.p.
        1 - e^-depth)."""
        return float(np.e * self.total / self.width)

    def _header(self) -> dict[str, Any]:
        return {
            "depth": self.depth,
            "width_bits": self.width_bits,
            "seed": self.seed,
        }

    def _payload(self) -> list[np.ndarray]:
        return [self.table]

    @classmethod
    def _from_parts(cls, header: dict[str, Any], buf: memoryview) -> "CountMinSketch":
        d, wb = int(header["depth"]), int(header["width_bits"])
        table = (
            np.frombuffer(buf, dtype=np.int64, count=d << wb)
            .reshape(d, 1 << wb)
            .copy()
        )
        return cls(d, wb, int(header["seed"]), table)
