"""Merging t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", 2019) with the k1 (arcsine) scale function.

Centroid budget ~delta; rank error is O(q(1-q)/delta) — tightest at the
tails.  Merge = concatenate centroid lists + one vectorized recompress
(sort -> scale-function bucketing -> weighted reduceat), which is exactly
the paper's merging-digest algorithm expressed as array ops.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import Sketch


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    q = np.clip(q, 1e-12, 1 - 1e-12)
    return delta * (np.arcsin(2.0 * q - 1.0) / np.pi + 0.5)


def _compress(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """One merging pass over value-sorted centroids: centroids whose k1
    midpoints floor to the same integer merge (weighted mean)."""
    if means.size <= 1:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    mid = np.cumsum(weights) - weights / 2.0
    bucket = np.floor(_k1(mid / total, delta)).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    w = np.add.reduceat(weights, starts)
    m = np.add.reduceat(means * weights, starts) / w
    return m, w


class TDigest(Sketch):
    TYPE_TAG = 4

    def __init__(
        self,
        delta: float = 200.0,
        means: np.ndarray | None = None,
        weights: np.ndarray | None = None,
        vmin: float = np.inf,
        vmax: float = -np.inf,
    ):
        if delta < 10:
            raise ValueError("delta too small")
        self.delta = float(delta)
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = weights if weights is not None else np.empty(0, np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        w = (
            np.asarray(counts, dtype=np.float64)
            if counts is not None
            else np.ones(v.size)
        )
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.means, self.weights = _compress(
            np.concatenate([self.means, v]),
            np.concatenate([self.weights, w]),
            self.delta,
        )

    def merge(self, other: "Sketch") -> "TDigest":
        self._check_merge(other)
        assert isinstance(other, TDigest)
        m, w = _compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
            self.delta,
        )
        return TDigest(
            self.delta,
            m,
            w,
            min(self.vmin, other.vmin),
            max(self.vmax, other.vmax),
        )

    @property
    def total(self) -> float:
        return float(self.weights.sum())

    def _anchors(self) -> tuple[np.ndarray, np.ndarray]:
        """Interpolation anchors: (cumulative rank at centroid midpoints,
        centroid means), with exact min/max pinned at ranks 0 and N."""
        mid = np.cumsum(self.weights) - self.weights / 2.0
        x = np.r_[0.0, mid, self.total]
        y = np.r_[self.vmin, self.means, self.vmax]
        return x, y

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        if self.weights.size == 0:
            return np.full(np.shape(q) or (1,), np.nan)
        x, y = self._anchors()
        return np.interp(np.asarray(q, dtype=np.float64) * self.total, x, y)

    def cdf(self, values: float | np.ndarray) -> np.ndarray:
        if self.weights.size == 0:
            return np.full(np.shape(values) or (1,), np.nan)
        x, y = self._anchors()
        return np.interp(np.asarray(values, dtype=np.float64), y, x) / self.total

    def _header(self) -> dict[str, Any]:
        return {"delta": self.delta}

    def _payload(self) -> list[np.ndarray]:
        return [
            np.array([self.means.size, self.vmin, self.vmax], dtype=np.float64),
            self.means.astype(np.float64),
            self.weights.astype(np.float64),
        ]

    @classmethod
    def _from_parts(cls, header: dict[str, Any], buf: memoryview) -> "TDigest":
        meta = np.frombuffer(buf, dtype=np.float64, count=3)
        n = int(meta[0])
        means = np.frombuffer(buf, dtype=np.float64, count=n, offset=24).copy()
        weights = np.frombuffer(
            buf, dtype=np.float64, count=n, offset=24 + 8 * n
        ).copy()
        return cls(float(header["delta"]), means, weights, meta[1], meta[2])
