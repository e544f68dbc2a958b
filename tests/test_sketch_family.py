"""Sketch family: accuracy bounds, merge associativity/equivalence,
serialization round-trips, and merge-config guards."""

import numpy as np
import pytest

from cqf_spark.functions.hashing import murmur64a_u64
from cqf_spark.sketches import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KllSketch,
    TDigest,
    from_bytes,
)

RNG = np.random.default_rng(123)
KEYS = RNG.integers(0, 2**62, 100_000).astype(np.uint64)
HASHES = murmur64a_u64(KEYS, 42)
VALUES = RNG.lognormal(0.0, 1.0, 100_000)


def _split(arr, k=5):
    return np.array_split(arr, k)


def test_hll_bound_and_merge():
    full = HyperLogLog(12)
    full.update(HASHES)
    true = np.unique(KEYS).size
    assert abs(full.estimate() / true - 1) <= 3 * full.rel_error
    parts = []
    for chunk in _split(HASHES):
        s = HyperLogLog(12)
        s.update(chunk)
        parts.append(s)
    # shuffled merge orders give identical registers (max is commutative)
    m1 = parts[0].merge(parts[1]).merge(parts[2]).merge(parts[3]).merge(parts[4])
    m2 = parts[4].merge(parts[2]).merge(parts[0]).merge(parts[3]).merge(parts[1])
    assert np.array_equal(m1.registers, m2.registers)
    assert np.array_equal(m1.registers, full.registers)
    rt = from_bytes(full.to_bytes())
    assert isinstance(rt, HyperLogLog) and rt.estimate() == full.estimate()


def test_hll_small_range_linear_counting():
    s = HyperLogLog(14)
    s.update(murmur64a_u64(np.arange(50, dtype=np.uint64), 1))
    assert abs(s.estimate() - 50) < 3


def test_countmin_never_underestimates():
    zipf = (RNG.zipf(1.3, 200_000) % 5_000).astype(np.uint64)
    h = murmur64a_u64(zipf, 42)
    cm = CountMinSketch(4, 14)
    cm.update(h)
    uniq, true = np.unique(zipf, return_counts=True)
    est = cm.query(murmur64a_u64(uniq, 42))
    assert (est >= true).all()
    assert (est - true).max() <= 4 * cm.error_bound() + 1
    assert cm.total == 200_000
    halves = _split(h, 2)
    a, b = CountMinSketch(4, 14), CountMinSketch(4, 14)
    a.update(halves[0])
    b.update(halves[1])
    assert np.array_equal(a.merge(b).table, cm.table)
    assert np.array_equal(from_bytes(cm.to_bytes()).table, cm.table)


def test_countmin_weighted_counts():
    cm = CountMinSketch(4, 12)
    cm.update(HASHES[:10], np.full(10, 7, dtype=np.int64))
    assert (cm.query(HASHES[:10]) >= 7).all()
    assert cm.total == 70


def test_bloom_no_false_negatives_and_fp_bound():
    uniq = np.unique(KEYS)
    bf = BloomFilter.for_capacity(uniq.size, 0.01)
    bf.update(murmur64a_u64(uniq, 42))
    assert bf.contains(murmur64a_u64(uniq, 42)).all()
    absent = RNG.integers(2**62, 2**63, 50_000).astype(np.uint64)
    fpr = bf.contains(murmur64a_u64(absent, 42)).mean()
    assert fpr <= 1.5 * bf.expected_fp_rate(uniq.size)
    parts = _split(uniq, 3)
    merged = BloomFilter.merge_many(
        [
            _built(BloomFilter(bf.m_bits_log2, bf.k), murmur64a_u64(p, 42))
            for p in parts
        ]
    )
    assert np.array_equal(merged.words, bf.words)
    rt = from_bytes(bf.to_bytes())
    assert np.array_equal(rt.words, bf.words) and rt.n_added == bf.n_added


def _built(sk, h):
    sk.update(h)
    return sk


@pytest.mark.parametrize("cls,kw", [(TDigest, {"delta": 200.0}), (KllSketch, {"k": 200})])
def test_quantile_sketch_rank_error(cls, kw):
    full = cls(**kw)
    full.update(VALUES)
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    est = full.quantile(qs)
    ranks = np.array([(VALUES <= e).mean() for e in est])
    assert np.abs(ranks - qs).max() <= 0.02
    # distributed: 8 partial sketches merged
    parts = []
    for chunk in _split(VALUES, 8):
        s = cls(**kw)
        s.update(chunk)
        parts.append(s)
    merged = cls.merge_many(parts)
    est2 = merged.quantile(qs)
    ranks2 = np.array([(VALUES <= e).mean() for e in est2])
    assert np.abs(ranks2 - qs).max() <= 0.03
    rt = from_bytes(merged.to_bytes())
    assert np.allclose(rt.quantile(qs), est2)


def test_tdigest_cdf_inverse():
    td = TDigest(200.0)
    td.update(VALUES)
    med = td.quantile(0.5)
    assert abs(td.cdf(med) - 0.5) < 0.01


def test_merge_config_mismatch_raises():
    a, b = HyperLogLog(12), HyperLogLog(14)
    with pytest.raises(ValueError):
        a.merge(b)
    with pytest.raises(ValueError):
        CountMinSketch(4, 14).merge(CountMinSketch(5, 14))
    with pytest.raises(ValueError):
        TDigest(100.0).merge(TDigest(200.0))
    with pytest.raises(ValueError):
        HyperLogLog(12).merge(CountMinSketch(4, 12))  # type: ignore


def test_blob_self_describing_dispatch():
    sketches = [
        _built(HyperLogLog(10), HASHES[:100]),
        _built(CountMinSketch(3, 10), HASHES[:100]),
        _built(BloomFilter(12, 5), HASHES[:100]),
        _built(TDigest(100.0), VALUES[:100]),
        _built(KllSketch(64), VALUES[:100]),
    ]
    for s in sketches:
        assert type(from_bytes(s.to_bytes())) is type(s)
    with pytest.raises(ValueError):
        from_bytes(b"garbage-blob-garbage")
