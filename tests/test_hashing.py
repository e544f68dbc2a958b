"""Bit-exact parity of the hash family with the reference C implementation
(golden vectors from src/hashutil.c:23-64, 132-181)."""

import numpy as np

from cqf_spark.functions.hashing import (
    hash_64,
    hash_64i,
    murmur64a_bytes,
    murmur64a_u64,
)


def test_murmur_u64_golden(golden):
    rows = golden["murmur_u64"]
    keys = np.array([r[0] for r in rows], dtype=np.uint64)
    for key, seed, expect in rows:
        got = murmur64a_u64(np.array([key], dtype=np.uint64), seed)[0]
        assert int(got) == expect
    # batch path agrees with per-element path
    seeds = {r[1] for r in rows}
    for seed in list(seeds)[:3]:
        batch = murmur64a_u64(keys, seed)
        single = np.array(
            [murmur64a_u64(keys[i : i + 1], seed)[0] for i in range(keys.size)]
        )
        assert (batch == single).all()


def test_murmur_bytes_golden(golden):
    rows = golden["murmur_bytes"]
    data = [bytes.fromhex(r[0]) for r in rows]
    expect = np.array([r[1] for r in rows], dtype=np.uint64)
    got = murmur64a_bytes(data, 42)
    assert (got == expect).all()


def test_murmur_bytes_matches_u64_on_8_bytes():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, 100, dtype=np.uint64)
    as_bytes = [int(k).to_bytes(8, "little") for k in keys]
    assert (murmur64a_bytes(as_bytes, 99) == murmur64a_u64(keys, 99)).all()


def test_wang_golden_and_inverse(golden):
    for key, kb, h_expect, ki_expect in golden["wang"]:
        mask = (1 << kb) - 1 if kb < 64 else 0xFFFFFFFFFFFFFFFF
        h = hash_64(np.array([key], dtype=np.uint64), mask)[0]
        assert int(h) == h_expect
        ki = hash_64i(np.array([h], dtype=np.uint64), mask)[0]
        assert int(ki) == ki_expect == key  # bijectivity round-trip


def test_wang_bijective_bulk():
    rng = np.random.default_rng(3)
    for kb in (8, 17, 32, 53, 64):
        mask = (1 << kb) - 1 if kb < 64 else 0xFFFFFFFFFFFFFFFF
        keys = rng.integers(0, 2**64, 5000, dtype=np.uint64) & np.uint64(mask)
        h = hash_64(keys, mask)
        assert (hash_64i(h, mask) == keys).all()
        assert np.unique(h).size == np.unique(keys).size
