"""Mergeable approximate-aggregation sketch family (north_rule).

Every sketch here follows the same contract the CQF core does
(SURVEY.md §2.6): serializable to bytes, associatively mergeable across
partitions, built from one vectorized numpy pass per Arrow batch — so the
distributed harness (build partials per partition -> merge tree) is shared
by all of them.
"""

from .base import Sketch, from_bytes
from .bloom import BloomFilter
from .countmin import CountMinSketch
from .hll import HyperLogLog
from .kll import KllSketch
from .tdigest import TDigest

__all__ = [
    "Sketch",
    "from_bytes",
    "BloomFilter",
    "CountMinSketch",
    "HyperLogLog",
    "KllSketch",
    "TDigest",
]
