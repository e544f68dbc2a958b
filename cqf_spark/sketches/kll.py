"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016).

Level h holds items of weight 2^h; a full level is sorted and every other
item (random parity) is promoted to level h+1.  Rank error is O(1/k) with
high probability.  Compaction randomness is seeded from (seed,
compaction counter) so a given build is reproducible run-to-run while
retaining the algorithm's randomized guarantees.

Merge = levelwise concatenation + compaction sweep (associative in
distribution; rank guarantees compose across merges, per the paper).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import Sketch


class KllSketch(Sketch):
    TYPE_TAG = 5

    def __init__(
        self,
        k: int = 200,
        seed: int = 0x1211,
        levels: list[np.ndarray] | None = None,
        n: int = 0,
        n_compactions: int = 0,
    ):
        if k < 8:
            raise ValueError("k too small")
        self.k = k
        self.seed = seed
        self.levels: list[np.ndarray] = (
            levels if levels is not None else [np.empty(0, np.float64)]
        )
        self.n = n
        self.n_compactions = n_compactions

    def _capacity(self, h: int) -> int:
        """Capacity of level h given current height (2/3 decay toward the
        bottom, floor of 8 — the paper's c=2/3 schedule)."""
        height = len(self.levels)
        return max(8, int(np.ceil(self.k * (2.0 / 3.0) ** (height - 1 - h))))

    def _compact_if_needed(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size <= self._capacity(h):
                h += 1
                continue
            buf = np.sort(self.levels[h], kind="stable")
            rng = np.random.default_rng(
                (self.seed & 0x7FFFFFFF, self.n_compactions)
            )
            self.n_compactions += 1
            off = int(rng.integers(0, 2))
            promoted = buf[off::2]
            self.levels[h] = np.empty(0, np.float64)
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            # promoting may overflow the next level: loop continues upward

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if counts is not None:
            v = np.repeat(v, np.asarray(counts, dtype=np.int64))
        if v.size == 0:
            return
        self.n += int(v.size)
        # absorb in level-0-capacity chunks so memory stays O(k log n)
        cap = max(self._capacity(0), 64)
        for i in range(0, v.size, cap):
            self.levels[0] = np.concatenate([self.levels[0], v[i : i + cap]])
            self._compact_if_needed()

    def merge(self, other: "Sketch") -> "KllSketch":
        self._check_merge(other)
        assert isinstance(other, KllSketch)
        height = max(len(self.levels), len(other.levels))
        levels = []
        for h in range(height):
            a = self.levels[h] if h < len(self.levels) else np.empty(0, np.float64)
            b = (
                other.levels[h]
                if h < len(other.levels)
                else np.empty(0, np.float64)
            )
            levels.append(np.concatenate([a, b]))
        out = KllSketch(
            self.k,
            self.seed,
            levels,
            self.n + other.n,
            self.n_compactions + other.n_compactions,
        )
        out._compact_if_needed()
        return out

    # -- queries -----------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items = np.concatenate(self.levels) if self.levels else np.empty(0)
        weights = np.concatenate(
            [
                np.full(lv.size, 2.0**h)
                for h, lv in enumerate(self.levels)
            ]
            or [np.empty(0)]
        )
        order = np.argsort(items, kind="stable")
        return items[order], weights[order]

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        items, weights = self._weighted_items()
        if items.size == 0:
            return np.full(np.shape(q) or (1,), np.nan)
        cum = np.cumsum(weights)
        target = np.asarray(q, dtype=np.float64) * cum[-1]
        idx = np.minimum(np.searchsorted(cum, target, side="left"), items.size - 1)
        return items[idx]

    def cdf(self, values: float | np.ndarray) -> np.ndarray:
        items, weights = self._weighted_items()
        if items.size == 0:
            return np.full(np.shape(values) or (1,), np.nan)
        cum = np.concatenate([[0.0], np.cumsum(weights)])
        idx = np.searchsorted(items, np.asarray(values, dtype=np.float64), "right")
        return cum[idx] / cum[-1]

    # -- serialization -------------------------------------------------------
    def _header(self) -> dict[str, Any]:
        return {"k": self.k, "seed": self.seed}

    def _payload(self) -> list[np.ndarray]:
        sizes = np.array(
            [len(self.levels), self.n, self.n_compactions]
            + [lv.size for lv in self.levels],
            dtype=np.int64,
        )
        return [sizes] + [lv.astype(np.float64) for lv in self.levels]

    @classmethod
    def _from_parts(cls, header: dict[str, Any], buf: memoryview) -> "KllSketch":
        head = np.frombuffer(buf, dtype=np.int64, count=3)
        nlev, n, ncomp = int(head[0]), int(head[1]), int(head[2])
        sizes = np.frombuffer(buf, dtype=np.int64, count=nlev, offset=24)
        off = 24 + 8 * nlev
        levels = []
        for s in sizes:
            levels.append(
                np.frombuffer(buf, dtype=np.float64, count=int(s), offset=off).copy()
            )
            off += 8 * int(s)
        return cls(int(header["k"]), int(header["seed"]), levels, n, ncomp)
