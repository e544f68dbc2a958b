"""Cqf core: parity with the reference's own test suite (src/test.c flow),
golden-content equality, merge associativity with bit-identical bytes, and
the published false-positive bound."""

import numpy as np
import pytest

from cqf_spark.config import CqfConfig, HashMode
from cqf_spark.core import Cqf, NoSpaceError, hash_keys


def _cfg(key_bits, seed=12345, mode=HashMode.DEFAULT, value_bits=0):
    return CqfConfig(
        key_bits=key_bits, value_bits=value_bits, hash_mode=mode, seed=seed
    )


# --------------------------------------------------------------------- #
# golden parity with the compiled reference
# --------------------------------------------------------------------- #

def test_golden_content_parity(golden):
    """Insert the exact keys the reference harness inserted; our decoded
    (hash, count) multiset must equal the reference iterator's output."""
    g = golden["cqf_default"]
    cfg = _cfg(g["key_bits"], seed=g["seed"])
    keys = np.array(g["keys"], dtype=np.uint64)
    counts = np.array(
        [3 + (i % 50) if i % 11 == 0 else 1 + (i % 2) for i in range(keys.size)],
        dtype=np.uint64,
    )
    sk = Cqf.from_keys(cfg, keys, counts, qbits=g["qbits"], auto_resize=False)
    expect = np.array(g["items"], dtype=np.uint64)
    kh, _, cnt = sk.items()
    assert kh.size == expect.shape[0]
    assert (kh == expect[:, 0]).all()
    assert (cnt == expect[:, 1]).all()
    assert sk.nelts == g["nelts"]
    assert sk.ndistinct == g["ndistinct"]
    # reference counts occupied slots identically (variable-length encodings)
    assert sk.noccupied == g["noccupied"]


def test_golden_probe_parity(golden):
    g = golden["cqf_default"]
    cfg = _cfg(g["key_bits"], seed=g["seed"])
    keys = np.array(g["keys"], dtype=np.uint64)
    counts = np.array(
        [3 + (i % 50) if i % 11 == 0 else 1 + (i % 2) for i in range(keys.size)],
        dtype=np.uint64,
    )
    sk = Cqf.from_keys(cfg, keys, counts, qbits=g["qbits"], auto_resize=False)
    probes = np.array([p[0] for p in golden["cqf_default"]["probes"]], dtype=np.uint64)
    expect = np.array([p[1] for p in golden["cqf_default"]["probes"]], dtype=np.uint64)
    assert (sk.count(probes) == expect).all()
    # the authentic rank/select navigation path agrees
    assert (sk.count_navigate(probes) == expect).all()


def test_golden_merge_parity(golden):
    g = golden["merge"]
    cfg = _cfg(g["key_bits"], seed=g["seed"])
    ka = np.array([r[0] for r in g["keys_a"]], dtype=np.uint64)
    ca = np.array([r[1] for r in g["keys_a"]], dtype=np.uint64)
    kb = np.array([r[0] for r in g["keys_b"]], dtype=np.uint64)
    cb = np.array([r[1] for r in g["keys_b"]], dtype=np.uint64)
    a = Cqf.from_keys(cfg, ka, ca, qbits=g["qa"], auto_resize=False)
    b = Cqf.from_keys(cfg, kb, cb, qbits=g["qb"], auto_resize=False)
    m = a.merge(b, qbits=g["qm"])
    expect = np.array(g["items"], dtype=np.uint64)
    kh, _, cnt = m.items()
    assert kh.size == expect.shape[0]
    assert (kh == expect[:, 0]).all()
    assert (cnt == expect[:, 1]).all()


# --------------------------------------------------------------------- #
# the reference's flagship round-trip (src/test.c:26-215, scaled down)
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("mode", [HashMode.DEFAULT, HashMode.INVERTIBLE])
def test_test_filter_roundtrip(mode):
    qbits, r = 14, 8
    cfg = _cfg(qbits + r, mode=mode)
    nvals = int(0.95 * (1 << qbits) / 3)  # count=4 -> ~3 slots per key
    rng = np.random.default_rng(42)
    keys = np.unique(rng.integers(0, 1 << (qbits + r), nvals, dtype=np.uint64))
    sk = Cqf.from_keys(
        cfg, keys, np.full(keys.size, 4, dtype=np.uint64), qbits=qbits
    )
    # 1. lookups >= inserted count (test.c:80-87)
    assert (sk.count(keys) >= 4).all()
    # 2. serialize -> deserialize -> identical bytes and counts (test.c:111-134)
    blob = sk.to_bytes()
    sk2 = Cqf.from_bytes(blob)
    assert sk2.to_bytes() == blob
    assert (sk2.count(keys) >= 4).all()
    assert sk2.nelts == sk.nelts and sk2.ndistinct == sk.ndistinct
    # 3. iterator walk: every key's count present; unique_index strictly
    #    increasing over hash order (test.c:136-184)
    kh, _, cnt = sk.items()
    assert (cnt >= 4).all()
    assert int(cnt.sum()) == sk.nelts
    idxs = [sk.unique_index(int(k)) for k in keys[:50]]
    assert all(i >= 0 for i in idxs)
    hs = hash_keys(keys[:50], cfg)
    order = np.argsort(hs)
    assert (np.diff(np.array(idxs)[order]) > 0).all()
    # 4. delete-then-absent (test.c:187-210)
    victim = int(keys[7])
    sk3 = sk.delete_key_value(victim)
    assert int(sk3.count(np.array([victim], dtype=np.uint64))[0]) == 0
    others = keys[keys != keys[7]]
    assert (sk3.count(others) >= 4).all()
    # 5. INVERTIBLE mode recovers keys exactly
    if mode == HashMode.INVERTIBLE:
        assert (np.sort(sk.keys()) == np.sort(keys)).all()


def test_remove_and_set_count():
    cfg = _cfg(20)
    keys = np.arange(100, dtype=np.uint64)
    sk = Cqf.from_keys(cfg, keys, np.full(100, 10, dtype=np.uint64), qbits=8)
    sk = sk.remove(keys[:10], np.full(10, 4, dtype=np.uint64))
    assert (sk.count(keys[:10]) == 6).all()
    assert (sk.count(keys[10:]) == 10).all()
    sk = sk.set_count(5, 123)
    assert int(sk.count(np.array([5], dtype=np.uint64))[0]) == 123
    # remove clamps at zero (src/gqf.c:1996)
    sk = sk.remove(np.array([6], dtype=np.uint64), np.array([99], dtype=np.uint64))
    assert int(sk.count(np.array([6], dtype=np.uint64))[0]) == 0


def test_auto_resize_on_overflow():
    cfg = _cfg(24)
    keys = np.arange(2000, dtype=np.uint64)
    sk = Cqf.from_keys(cfg, keys, qbits=8)  # 256 slots — must grow
    assert sk.geom.qbits > 8
    assert (sk.count(keys) == 1).all()
    with pytest.raises(NoSpaceError):
        Cqf.from_keys(cfg, keys, qbits=8, auto_resize=False)


def test_resized_preserves_content():
    cfg = _cfg(22)
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**40, 500, dtype=np.uint64)
    sk = Cqf.from_keys(cfg, keys, qbits=10)
    grown = sk.resized(12)
    assert grown.nelts == sk.nelts and grown.ndistinct == sk.ndistinct
    assert (grown.count(keys) == sk.count(keys)).all()


# --------------------------------------------------------------------- #
# merge semantics (src/gqf.c:2432-2544) + canonical bytes
# --------------------------------------------------------------------- #

def test_merge_associative_bit_identical():
    cfg = _cfg(26, seed=777)
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**50, 3000, dtype=np.uint64)
    counts = rng.integers(1, 40, 3000, dtype=np.uint64)
    parts = np.array_split(np.arange(3000), 4)
    sketches = [
        Cqf.from_keys(cfg, keys[p], counts[p], qbits=12) for p in parts
    ]
    single = Cqf.from_keys(cfg, keys, counts, qbits=12)
    m1 = Cqf.merge_many(sketches, qbits=12)
    m2 = Cqf.merge_many(sketches[::-1], qbits=12)
    m3 = sketches[0].merge(sketches[1]).merge(sketches[2]).merge(sketches[3])
    assert m1.to_bytes() == m2.to_bytes() == m3.to_bytes() == single.to_bytes()
    assert m1.nelts == int(counts.sum())


def test_merge_rejects_config_mismatch():
    a = Cqf.from_keys(_cfg(20, seed=1), np.arange(10, dtype=np.uint64), qbits=8)
    b = Cqf.from_keys(_cfg(20, seed=2), np.arange(10, dtype=np.uint64), qbits=8)
    with pytest.raises(ValueError):
        a.merge(b)  # we FIX the reference's &&-vs-|| check (src/gqf.c:2438)


def test_intersect_inner_product_magnitude():
    cfg = _cfg(30, mode=HashMode.INVERTIBLE)
    a_keys = np.arange(0, 600, dtype=np.uint64)
    b_keys = np.arange(300, 900, dtype=np.uint64)
    a = Cqf.from_keys(cfg, a_keys, np.full(600, 2, np.uint64), qbits=10)
    b = Cqf.from_keys(cfg, b_keys, np.full(600, 3, np.uint64), qbits=10)
    inter = a.intersect(b)
    assert inter.ndistinct == 300  # exact: INVERTIBLE has no collisions
    assert a.inner_product(b) == 300 * 2 * 3
    assert a.magnitude() == int(np.sqrt(600 * 4))
    assert a.inner_product(a) == 600 * 4


# --------------------------------------------------------------------- #
# false-positive bound (bm.c:767-831 methodology)
# --------------------------------------------------------------------- #

def test_fp_rate_bound_at_95_load():
    qbits, r = 16, 8
    cfg = _cfg(qbits + r, seed=2024)
    nvals = int(0.95 * (1 << qbits))
    rng = np.random.default_rng(99)
    keys = rng.integers(0, 2**63, nvals, dtype=np.uint64)
    sk = Cqf.from_keys(cfg, keys, qbits=qbits)  # count=1 each, ~95% load
    assert sk.load_factor > 0.90
    # no false negatives, ever
    assert (sk.count(keys) > 0).all()
    # disjoint probe stream
    probes = rng.integers(2**63, 2**64, 200_000, dtype=np.uint64)
    fp = int((sk.count(probes) > 0).sum())
    rate = fp / probes.size
    bound = 2.0**-r  # published bound at this load (README.md:36-38)
    assert rate <= bound * 1.5, f"FP rate {rate:.5f} vs bound {bound:.5f}"


def test_value_bits_roundtrip():
    cfg = _cfg(20, value_bits=4)
    keys = np.arange(50, dtype=np.uint64)
    vals = (keys * 3) & np.uint64(0xF)
    sk = Cqf.from_keys(cfg, keys, values=vals, qbits=8)
    cnt, got_vals = sk.query(keys)
    assert (cnt == 1).all()
    assert (got_vals == vals).all()
    # count_key_value with the right value matches; wrong value misses
    assert (sk.count(keys, vals) == 1).all()
    assert (sk.count(keys, (vals + np.uint64(1)) & np.uint64(0xF)) == 0).all()


def test_items_from_range_scan():
    cfg = _cfg(20, mode=HashMode.NONE)
    keys = np.arange(0, 1000, 10, dtype=np.uint64)
    sk = Cqf.from_keys(cfg, keys, qbits=8)
    h, c = sk.items_from(500)
    assert int(h[0]) == 500
    assert h.size == 50


def test_null_keys_dropped_and_probes_safe(spark):
    """Null keys never enter a sketch; null probes return 0/False."""
    from cqf_spark.aggregator import (
        contains_udf,
        count_udf,
        cqf_aggregate,
    )
    from cqf_spark.config import CqfConfig, HashMode

    cfg = CqfConfig(key_bits=48, hash_mode=HashMode.INVERTIBLE, seed=5)
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "k long"
    )
    sk = cqf_aggregate(df, "k", cfg)
    assert sk.sum_of_counts == 3 and sk.num_distinct == 2
    probes = spark.createDataFrame([(1,), (None,), (7,)], "k long")
    rows = probes.select(
        "k",
        count_udf(spark, sk)("k").alias("c"),
        contains_udf(spark, sk)("k").alias("m"),
    ).collect()
    got = {r.k: (r.c, r.m) for r in rows}
    assert got[1] == (2, True)
    assert got[None] == (0, False)
    assert got[7] == (0, False)
