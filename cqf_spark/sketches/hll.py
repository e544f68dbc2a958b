"""HyperLogLog (Flajolet et al. 2007, with the standard bias corrections)
over 64-bit Murmur hashes — no 32-bit large-range correction needed.

Standard error ~= 1.04 / sqrt(m); merge = elementwise register max
(associative, commutative, idempotent).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..functions.bitpack import popcount_words
from .base import Sketch


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros via SWAR smear + popcount."""
    x = x.astype(np.uint64, copy=True)
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    return (64 - popcount_words(x)).astype(np.uint8)


class HyperLogLog(Sketch):
    TYPE_TAG = 1

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers
            if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    # -- build -------------------------------------------------------------
    def update(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Absorb a batch of 64-bit hashes (counts are irrelevant to
        distinct-counting and ignored)."""
        h = hashes.astype(np.uint64, copy=False)
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)  # low 64-p bits, left-aligned
        rho = np.where(w == 0, 64 - self.p + 1, _clz64(w) + 1).astype(np.uint8)
        # per-register max over the batch, then max into the registers
        order = np.argsort(idx, kind="stable")
        idx_s, rho_s = idx[order], rho[order]
        starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
        batch_max = np.maximum.reduceat(rho_s, starts)
        uniq = idx_s[starts]
        self.registers[uniq] = np.maximum(self.registers[uniq], batch_max)

    def merge(self, other: "Sketch") -> "HyperLogLog":
        self._check_merge(other)
        assert isinstance(other, HyperLogLog)
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    # -- estimate ----------------------------------------------------------
    @property
    def alpha(self) -> float:
        m = self.m
        if m >= 128:
            return 0.7213 / (1 + 1.079 / m)
        return {16: 0.673, 32: 0.697, 64: 0.709}[m]

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        e = self.alpha * self.m * self.m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * self.m and zeros > 0:
            return float(self.m * np.log(self.m / zeros))  # linear counting
        return float(e)

    @property
    def rel_error(self) -> float:
        return 1.04 / np.sqrt(self.m)

    # -- serialization -----------------------------------------------------
    def _header(self) -> dict[str, Any]:
        return {"p": self.p}

    def _payload(self) -> list[np.ndarray]:
        return [self.registers]

    @classmethod
    def _from_parts(cls, header: dict[str, Any], buf: memoryview) -> "HyperLogLog":
        p = int(header["p"])
        regs = np.frombuffer(buf, dtype=np.uint8, count=1 << p).copy()
        return cls(p, regs)
