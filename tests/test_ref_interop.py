"""Reference on-disk image interop (qf_serialize/qf_deserialize parity).

Fixtures in data_ref_images.json were produced by a harness linked against
/root/reference: qf_init into a zeroed buffer, incremental qf_insert in a
scrambled order with counts split across two passes (exercising counter
splice paths), then qf_serialize.  The gates:

* ingest: from_reference_bytes decodes the exact insert multiset;
* emit:   to_reference_bytes reproduces the C image byte-for-byte (the
  canonical bulk layout equals the layout incremental inserts converge to);
* rebuild: decode -> canonical rebuild -> emit is also byte-identical.
"""

import base64
import json
import os

import numpy as np
import pytest

from cqf_spark.config import CqfConfig, HashMode
from cqf_spark.core import Cqf, hash_keys

FIXTURES = os.path.join(os.path.dirname(__file__), "data_ref_images.json")


@pytest.fixture(scope="module")
def images():
    with open(FIXTURES) as f:
        return json.load(f)


@pytest.mark.parametrize("name", ["default", "invertible"])
def test_reference_image_round_trip(images, name):
    fx = images[name]
    img = base64.b64decode(fx["image_b64"])
    sk = Cqf.from_reference_bytes(img)

    assert sk.config == CqfConfig(
        key_bits=fx["key_bits"],
        hash_mode=HashMode(fx["hash_mode"]),
        seed=fx["seed"],
    )
    assert sk.geom.nslots == fx["nslots"]

    # decoded multiset == the multiset the C library was fed
    keys = np.array(fx["keys"], dtype=np.uint64)
    cnts = np.array(fx["counts"], dtype=np.uint64)
    h = hash_keys(keys, sk.config)
    exp: dict[int, int] = {}
    for hh, cc in zip(h.tolist(), cnts.tolist()):
        exp[hh] = exp.get(hh, 0) + cc
    got_h, _, got_c = sk.items()
    assert dict(zip(got_h.tolist(), got_c.tolist())) == exp
    assert sk.nelts == int(cnts.sum())
    assert sk.ndistinct == len(exp)

    # byte-identical re-emission, directly and after canonical rebuild
    assert sk.to_reference_bytes() == img
    assert sk.canonicalized().to_reference_bytes() == img


@pytest.mark.parametrize("name", ["default", "invertible"])
def test_reference_image_probes_match(images, name):
    fx = images[name]
    sk = Cqf.from_reference_bytes(base64.b64decode(fx["image_b64"]))
    keys = np.array(fx["keys"], dtype=np.uint64)
    cnts = np.array(fx["counts"], dtype=np.uint64)
    # counts by key (keys are unique in the fixture stream)
    got = sk.count(keys)
    assert (got >= cnts).all()  # no false negatives
    if sk.config.hash_mode == HashMode.INVERTIBLE:
        assert (got == cnts).all()  # bijective hash -> exact


def test_reference_image_validation(images):
    img = bytearray(base64.b64decode(images["default"]["image_b64"]))
    with pytest.raises(ValueError, match="magic"):
        Cqf.from_reference_bytes(b"\0" * 200)
    with pytest.raises(ValueError, match="truncated"):
        Cqf.from_reference_bytes(bytes(img[:64]))
    with pytest.raises(ValueError, match="size"):
        Cqf.from_reference_bytes(bytes(img[:-5]))
    # own-format blobs are rejected, not misparsed
    sk = Cqf.from_reference_bytes(bytes(img))
    with pytest.raises(ValueError):
        Cqf.from_reference_bytes(sk.to_bytes())
    with pytest.raises(ValueError):
        Cqf.from_bytes(sk.to_reference_bytes())


def test_reference_emit_from_scratch_build():
    """A sketch built natively emits an image the validator accepts and
    that round-trips content exactly."""
    cfg = CqfConfig(key_bits=22, hash_mode=HashMode.INVERTIBLE, seed=5)
    keys = np.random.default_rng(3).integers(0, 1 << 22, 3000, dtype=np.uint64)
    sk = Cqf.from_keys(cfg, keys)
    img = sk.to_reference_bytes()
    back = Cqf.from_reference_bytes(img)
    a, _, ca = sk.items()
    b, _, cb = back.items()
    assert (a == b).all() and (ca == cb).all()
    assert back.to_reference_bytes() == img
