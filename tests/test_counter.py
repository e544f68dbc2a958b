"""Counter codec: exhaustive inverse-property tests (the correctness
linchpin per SURVEY.md §7) mirroring src/gqf.c:1028-1167 semantics."""

import numpy as np
import pytest

from cqf_spark.functions.counter import (
    decode_counter,
    decode_runs,
    encode_counter,
    encode_counters,
)


@pytest.mark.parametrize("bps", [2, 3, 4, 8, 13])
def test_scalar_roundtrip_exhaustive_small(bps):
    full = 1 << bps
    rems = range(full) if full <= 32 else list(range(8)) + [full - 2, full - 1]
    for rem in rems:
        for cnt in list(range(1, 70)) + [255, 256, 1000, 65537]:
            enc = encode_counter(rem, cnt, bps)
            r, c, last = decode_counter(
                np.array(enc, dtype=np.uint64), 0, len(enc) - 1, bps
            )
            assert (r, c, last) == (rem, cnt, len(enc) - 1), (bps, rem, cnt, enc)


def test_spec_examples():
    # the spec comment at src/gqf.c:1028-1036
    assert encode_counter(5, 1, 4) == [5]
    assert encode_counter(5, 2, 4) == [5, 5]
    assert encode_counter(0, 3, 4) == [0, 0, 0]
    assert encode_counter(5, 3, 4) == [5, 0, 5]
    e = encode_counter(5, 100, 8)
    assert e[0] == 5 and e[-1] == 5
    assert all(d != 5 for d in e[1:-1])
    e0 = encode_counter(0, 100, 8)
    assert e0[0] == 0 and e0[-2:] == [0, 0]
    assert all(d != 0 for d in e0[1:-2])


def test_vectorized_encode_matches_scalar():
    rng = np.random.default_rng(11)
    for bps in (2, 3, 5, 8, 16):
        full = 1 << bps
        rems = rng.integers(0, full, 3000).astype(np.uint64)
        cnts = rng.integers(1, 100000, 3000).astype(np.uint64)
        flat, lens = encode_counters(rems, cnts, bps)
        off = 0
        for i in range(rems.size):
            assert flat[off : off + lens[i]].tolist() == encode_counter(
                int(rems[i]), int(cnts[i]), bps
            )
            off += lens[i]


def test_decode_runs_roundtrip():
    rng = np.random.default_rng(13)
    for bps in (3, 8):
        full = 1 << bps
        starts, ends, chunks, truth = [], [], [], []
        pos = 0
        for run in range(500):
            k = int(rng.integers(1, min(7, full) + 1))
            rems = np.sort(rng.choice(full, size=k, replace=False)).astype(np.uint64)
            cnts = rng.integers(1, 2000, k).astype(np.uint64)
            flat, _ = encode_counters(rems, cnts, bps)
            starts.append(pos)
            pos += flat.size
            ends.append(pos - 1)
            chunks.append(flat)
            truth.extend(
                (run, int(r), int(c)) for r, c in zip(rems.tolist(), cnts.tolist())
            )
        slots = np.concatenate(chunks)
        ri, rr, rc, rp = decode_runs(
            slots, np.array(starts), np.array(ends), bps
        )
        assert list(zip(ri.tolist(), rr.tolist(), rc.tolist())) == truth
        # counter start positions are strictly increasing in slot order
        assert (np.diff(rp) > 0).all()


def test_decode_runs_empty():
    ri, rr, rc, rp = decode_runs(
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        8,
    )
    assert ri.size == rr.size == rc.size == rp.size == 0
