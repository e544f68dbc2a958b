"""Sketch configuration — the distributed analog of ``qfmetadata``.

The reference fixes its geometry at ``qf_init`` time from
``(nslots, key_bits, value_bits, hash_mode, seed)`` (reference
src/gqf.c:1617-1701).  In the distributed setting the *hash space*
``(key_bits, value_bits, hash_mode, seed)`` must be identical across every
partition sketch (it is what makes merges well-defined — the reference
checks mode+seed at src/gqf.c:2438-2444 / 2486-2490, with a ``&&``-vs-``||``
condition bug we deliberately fix by asserting full-config equality), while
the slot count ``2**qbits`` may differ per instance (resize doubles it,
src/gqf.c:1819-1889; merges may target a larger filter, src/bm.c:682-696).

Hence ``CqfConfig`` carries only the hash-space parameters and is broadcast
once per job; each ``Cqf`` instance additionally carries its own ``qbits``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from enum import IntEnum


class HashMode(IntEnum):
    """Mirrors ``enum qf_hashmode`` (reference include/gqf.h:43-47)."""

    DEFAULT = 0      # MurmurHash64A % range — lossy, FP rate <= 2^-r
    INVERTIBLE = 1   # Thomas Wang bijective hash — no FPs within key_bits
    NONE = 2         # caller supplies pre-hashed keys


@dataclass(frozen=True)
class CqfConfig:
    """Hash-space parameters shared by every sketch in one job.

    key_bits:   size of the hash universe (``range = 1 << key_bits``);
                the reference derives ``range = nslots << key_remainder_bits``
                (src/gqf.c:1666-1667) which equals ``2**key_bits``.
    value_bits: low bits storing an opaque value next to the remainder
                (src/gqf.c:1925-1926).  The flagship path keeps 0, as every
                reference test does (src/test.c:46).
    """

    key_bits: int = 40
    value_bits: int = 0
    hash_mode: HashMode = HashMode.DEFAULT
    seed: int = 2038074743

    def __post_init__(self) -> None:
        if not (2 <= self.key_bits <= 64):
            raise ValueError(f"key_bits must be in [2, 64], got {self.key_bits}")
        if not (0 <= self.value_bits <= 16):
            raise ValueError(f"value_bits must be in [0, 16], got {self.value_bits}")
        if self.key_bits + self.value_bits > 64:
            raise ValueError("key_bits + value_bits must fit in 64 bits")
        if not (0 <= self.seed < 2**32):
            raise ValueError("seed must be a uint32")

    @property
    def range(self) -> int:
        """Hash universe size (reference src/gqf.c:1666-1667)."""
        return 1 << self.key_bits

    def geometry(self, qbits: int) -> "CqfGeometry":
        return CqfGeometry.derive(self, qbits)

    def qbits_for(self, n_distinct: int, load_factor: float = 0.95) -> int:
        """Smallest qbits whose 2**qbits slots hold n_distinct singleton
        entries under the reference's 95%-load rule (src/gqf.c:1902-1914).

        Counted entries need more slots (variable-length counters); the bulk
        builder auto-resizes on overflow, this is just the initial estimate.
        """
        need = max(int(math.ceil(n_distinct / load_factor)), 64)
        q = max(6, (need - 1).bit_length())
        # remainder must keep >= 2 bits (assert at src/gqf.c:1635)
        return min(q, self.key_bits - 2)


@dataclass(frozen=True)
class CqfGeometry:
    """Per-instance derived quantities (reference src/gqf.c:1617-1672)."""

    qbits: int
    nslots: int
    xnslots: int          # nslots + 10*sqrt(nslots) overflow runway
    nblocks: int
    total_slots: int      # nblocks * 64 (padded physical slot array)
    key_remainder_bits: int
    bits_per_slot: int

    SLOTS_PER_BLOCK = 64  # QF_SLOTS_PER_BLOCK (include/gqf_int.h:33-35)

    @classmethod
    def derive(cls, config: CqfConfig, qbits: int) -> "CqfGeometry":
        if qbits < 1:
            raise ValueError("qbits must be >= 1")
        nslots = 1 << qbits
        # xnslots = nslots + 10*sqrt(nslots), C double->int truncation
        # (src/gqf.c:1628)
        xnslots = nslots + int(10.0 * math.sqrt(float(nslots)))
        nblocks = (xnslots + cls.SLOTS_PER_BLOCK - 1) // cls.SLOTS_PER_BLOCK
        krb = config.key_bits - qbits
        if krb < 2:
            # reference asserts remainder >= 2 bits (src/gqf.c:1635)
            raise ValueError(
                f"key_bits={config.key_bits} leaves <2 remainder bits at qbits={qbits}"
            )
        bps = krb + config.value_bits
        return cls(
            qbits=qbits,
            nslots=nslots,
            xnslots=xnslots,
            nblocks=nblocks,
            total_slots=nblocks * cls.SLOTS_PER_BLOCK,
            key_remainder_bits=krb,
            bits_per_slot=bps,
        )
