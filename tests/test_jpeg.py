"""Baseline JPEG codec tests (functions/jpeg.py): round trips across
subsampling/restart/shape grids, a hand-built byte-level stream decoded
against pen-and-paper pixels (independent of our encoder), error bounds,
and the Spark integration through extract_features."""

import struct

from hypothesis import given, settings, strategies as st

import numpy as np
import pytest

from cqf_spark.functions.jpeg import decode_jpeg, encode_jpeg, is_jpeg


def _gradient(h, w, channels=3, seed=0):
    """Smooth test image (no wraparound edges — mod-256 ramps create
    255->0 discontinuities, JPEG's pathological ringing case)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = 128 + 90 * np.sin(x / 9.0) * np.cos(y / 7.0)
    if channels == 1:
        return np.clip(np.round(base), 0, 255).astype(np.uint8)
    chans = [
        np.clip(np.round(base * (0.7 + 0.15 * c) + rng.integers(0, 3)), 0, 255)
        for c in range(channels)
    ]
    return np.stack(chans, axis=-1).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("rst", [0, 3])
@pytest.mark.parametrize("shape", [(8, 8), (13, 21), (40, 56), (17, 32)])
def test_rgb_roundtrip_bounded_error(sub, rst, shape):
    img = _gradient(*shape)
    buf = encode_jpeg(img, subsampling=sub, restart_every=rst)
    assert is_jpeg(buf)
    out = decode_jpeg(buf)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).max()
    # smooth content through the ramp quant tables: small bounded error
    # (chroma subsampling averages 2x2 neighborhoods -> slightly looser)
    assert err <= (8 if sub == "444" else 12)


def test_solid_blocks_roundtrip_exact():
    for val in (0, 100, 255):
        img = np.full((24, 16, 3), val, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)
    g = np.full((8, 8), 77, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(g)), g)


def test_grayscale_roundtrip_with_restarts():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, restart_every=2))
    assert out.shape == img.shape
    # random noise is JPEG's worst case; ramp tables bound it loosely
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 32


def test_hand_built_stream_decodes_to_known_pixels():
    """8x8 grayscale built byte-by-byte from the spec: Q[0,0]=8, one DC
    symbol (category 2, extra bits '11' -> diff +3), EOB.  DC coef
    3*8=24 -> every pixel 24/8 + 128 = 131.  Exercises marker parsing,
    canonical table construction, extend(), dequant and IDCT with no
    help from our encoder."""
    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    qt = bytes([0]) + bytes([8] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2])
    dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    scan = bytes([0b01101111])  # DC code '0', bits '11', EOB '0', pad
    buf = (
        b"\xff\xd8"
        + seg(0xFFDB, qt)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht_dc)
        + seg(0xFFC4, dht_ac)
        + seg(0xFFDA, sos)
        + scan
        + b"\xff\xd9"
    )
    out = decode_jpeg(buf)
    assert out.shape == (8, 8)
    assert np.array_equal(out, np.full((8, 8), 131, dtype=np.uint8))


def test_rejects_progressive_and_garbage():
    img = _gradient(8, 8)
    buf = bytearray(encode_jpeg(img))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(b"not an image")
    assert not is_jpeg(b"\xff\xd8no")


def test_dqt_zigzag_order_is_spec_order():
    """The DQT segment must store the table in zigzag order: entry 1 is
    Q[0,1] and entry 2 is Q[1,0] (ramp tables make them equal; check a
    table that distinguishes positions via decode of a crafted stream)."""
    from cqf_spark.functions.jpeg import _ZZ_FLAT

    assert _ZZ_FLAT[0] == 0  # (0,0)
    assert _ZZ_FLAT[1] == 1  # (0,1)
    assert _ZZ_FLAT[2] == 8  # (1,0)
    assert _ZZ_FLAT[63] == 63  # (7,7)
    assert sorted(_ZZ_FLAT.tolist()) == list(range(64))


# --------------------------------------------------------------------- #
# Spark integration
# --------------------------------------------------------------------- #

def test_extract_features_decodes_real_jpeg(spark):
    from cqf_spark.operators.multimodal import extract_features

    img = _gradient(16, 24)
    rows = [
        (1, "image", bytearray(encode_jpeg(img)), (0, 99, 99, 3, 0, 0)),
        (2, "image", bytearray(b"\x01" * 64), (0, 4, 5, 3, 0, 0)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, media binary, "
        "meta struct<size_bytes: long, width: int, height: int, "
        "channels: int, sample_rate: int, n_frames: int>",
    )
    got = extract_features(media).toPandas().set_index("media_id")
    # JPEG row: feat_dim/pixel_mean from the DECODED pixels, not meta
    assert got.loc[1, "feat_dim"] == 16 * 24 * 3
    want_mean = round(float(decode_jpeg(encode_jpeg(img)).mean()), 4)
    assert got.loc[1, "pixel_mean"] == want_mean
    assert got.loc[2, "feat_dim"] == 4 * 5 * 3
    assert np.isnan(got.loc[2, "pixel_mean"])
    # strict mode accepts the JPEG row (it decodes for real)
    jpeg_only = media.where("media_id = 1")
    assert extract_features(jpeg_only, strict=True).count() == 1


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    val=st.integers(0, 255),
    sub=st.sampled_from(["444", "420"]),
)
def test_solid_color_property(h, w, val, sub):
    """Solid images (DC-only blocks) survive any shape/subsampling
    exactly — the quantized DC is reconstructed bit-for-bit."""
    img = np.full((h, w, 3), val, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, subsampling=sub)), img)
