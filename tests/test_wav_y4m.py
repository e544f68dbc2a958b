"""Golden round-trip tests for the pure-Python WAV and Y4M codecs
(functions/wav.py, functions/y4m.py) — the audio/video analogs of
test_png.py: encode with our encoder, decode, require exact arrays."""

import numpy as np
import pytest

from cqf_spark.functions.wav import decode_wav, encode_wav, is_wav
from cqf_spark.functions.y4m import (
    decode_y4m,
    encode_y4m,
    is_y4m,
    y4m_frame_geometry,
)


def test_wav_16bit_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(7)
    for shape in [(1000,), (777, 2), (64, 4)]:
        raw = rng.integers(-32768, 32767, size=shape, dtype=np.int16)
        buf = encode_wav(raw, sample_rate=22050)
        assert is_wav(buf)
        pcm, rate = decode_wav(buf)
        assert rate == 22050
        want = raw.reshape(raw.shape[0], -1)
        got = np.round(pcm * 32767.0).astype(np.int16)
        assert got.shape == want.shape
        assert np.array_equal(got, want)


def test_wav_8bit_roundtrip():
    rng = np.random.default_rng(8)
    raw = rng.integers(0, 256, size=500, dtype=np.uint8)
    pcm, rate = decode_wav(encode_wav(raw, sample_rate=8000, bits=8))
    assert rate == 8000
    got = np.round(pcm[:, 0] * 127.5 + 127.5).astype(np.uint8)
    assert np.array_equal(got, raw)


def test_wav_float_input_normalization():
    t = np.linspace(0, 1, 1600, dtype=np.float32)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    pcm, _ = decode_wav(encode_wav(sig))
    assert np.abs(pcm[:, 0] - sig).max() < 1e-4  # 16-bit quantization


def test_wav_skips_unknown_chunks():
    buf = bytearray(encode_wav(np.zeros(10, dtype=np.int16)))
    # splice a LIST chunk between "fmt " and "data" (word-aligned)
    fmt_end = buf.index(b"data")
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    spliced = bytes(buf[:fmt_end]) + extra + bytes(buf[fmt_end:])
    pcm, rate = decode_wav(spliced)
    assert pcm.shape == (10, 1) and rate == 16000


def test_wav_rejects_non_pcm_and_garbage():
    buf = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    tag_off = buf.index(b"fmt ") + 8
    buf[tag_off:tag_off + 2] = (85).to_bytes(2, "little")  # mp3 tag
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    assert not is_wav(b"RIFFxxxxJUNK")


def test_y4m_mono_roundtrip_and_sampling():
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(12, 10, 16), dtype=np.uint8)
    buf = encode_y4m(frames, colorspace="mono")
    assert is_y4m(buf)
    w, h, payload, _, n = y4m_frame_geometry(buf)
    assert (w, h, payload, n) == (16, 10, 160, 12)
    assert np.array_equal(decode_y4m(buf), frames)
    for k in (2, 5):
        assert np.array_equal(decode_y4m(buf, every_nth=k), frames[::k])


def test_y4m_420_luma_roundtrip():
    rng = np.random.default_rng(10)
    frames = rng.integers(0, 256, size=(5, 8, 12), dtype=np.uint8)
    buf = encode_y4m(frames, colorspace="420")
    got = decode_y4m(buf)
    assert np.array_equal(got, frames)


def test_y4m_rejects_corruption_and_unknown_colorspace():
    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    buf = bytearray(encode_y4m(frames, colorspace="mono"))
    start = bytes(buf).index(b"FRAME\n", 20)
    buf[start:start + 5] = b"FRAMX"
    with pytest.raises(ValueError, match="corrupt"):
        decode_y4m(bytes(buf))
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(encode_y4m(frames, colorspace="444"))
    with pytest.raises(ValueError):
        y4m_frame_geometry(b"not video")


# --------------------------------------------------------------------- #
# Spark integration: extract_features / demux_frames decode for real
# --------------------------------------------------------------------- #

_SCHEMA = (
    "media_id long, media_type string, media binary, "
    "meta struct<size_bytes: long, width: int, height: int, "
    "channels: int, sample_rate: int, n_frames: int>"
)


def _media(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_extract_features_decodes_real_wav_and_y4m(spark):
    from cqf_spark.operators.multimodal import extract_features

    rng = np.random.default_rng(11)
    wav_raw = rng.integers(-2000, 2000, size=100, dtype=np.int16)
    wav_buf = encode_wav(wav_raw, sample_rate=16000)
    frames = rng.integers(0, 256, size=(8, 6, 6), dtype=np.uint8)
    y4m_buf = encode_y4m(frames, colorspace="mono")
    rows = [
        (1, "audio", bytearray(wav_buf), (0, 0, 0, 0, 16000, 0)),
        (2, "audio", bytearray(b"\x01" * 64), (0, 0, 0, 0, 16000, 0)),
        (3, "video", bytearray(y4m_buf), (0, 6, 6, 0, 0, 99)),
        (4, "video", bytearray(b"\x02" * 64), (0, 4, 4, 0, 0, 7)),
    ]
    got = (
        extract_features(_media(spark, rows))
        .toPandas().set_index("media_id").sort_index()
    )
    # WAV row: feat_dim/pixel_mean from the DECODED pcm
    pcm, _ = decode_wav(wav_buf)
    assert got.loc[1, "feat_dim"] == pcm.size == 100
    assert got.loc[1, "pixel_mean"] == round(float(pcm.mean()), 4)
    # non-WAV audio: stub dims (one float per byte), no decoded stats
    assert got.loc[2, "feat_dim"] == 64
    assert np.isnan(got.loc[2, "pixel_mean"])
    # Y4M row: true demuxed frame count beats the (wrong) declared meta
    assert got.loc[3, "feat_dim"] == 8
    assert got.loc[3, "pixel_mean"] == round(float(frames.mean()), 4)
    # non-Y4M video: declared n_frames, no decoded stats
    assert got.loc[4, "feat_dim"] == 7
    assert np.isnan(got.loc[4, "pixel_mean"])


def test_strict_mode_passes_wav_y4m_raises_other(spark):
    from cqf_spark.operators.multimodal import extract_features

    ok = _media(spark, [
        (1, "audio", bytearray(encode_wav(np.zeros(8, dtype=np.int16))),
         (0, 0, 0, 0, 16000, 0)),
        (2, "video",
         bytearray(encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8),
                              colorspace="mono")),
         (0, 4, 4, 0, 0, 2)),
    ])
    assert extract_features(ok, strict=True).count() == 2

    for mtype, match in [("audio", "codec"), ("video", "codec")]:
        bad = _media(
            spark, [(9, mtype, bytearray(b"\x03" * 32), (0, 4, 4, 0, 0, 3))]
        )
        with pytest.raises(Exception, match=f"NotImplementedError|{match}"):
            extract_features(bad, strict=True).count()


def test_demux_frames_samples_real_luma_planes(spark):
    from cqf_spark.operators.multimodal import demux_frames

    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, size=(10, 5, 7), dtype=np.uint8)
    rows = [
        (1, "video", bytearray(encode_y4m(frames, colorspace="mono")),
         (0, 7, 5, 0, 0, 10)),
        (2, "video", bytearray(b"\x04" * 50), (0, 4, 4, 0, 0, 5)),
        (3, "image", bytearray(b"\x05" * 50), (0, 4, 4, 3, 0, 0)),
    ]
    got = (
        demux_frames(_media(spark, rows), every_nth=3)
        .toPandas().sort_values("frame_idx")
    )
    # only the real Y4M row demuxes; indices 0,3,6,9 with true luma means
    assert got["media_id"].unique().tolist() == [1]
    assert got["frame_idx"].tolist() == [0, 3, 6, 9]
    assert got["dims"].unique().tolist() == ["7x5"]
    want = [round(float(frames[k].mean()), 4) for k in (0, 3, 6, 9)]
    assert got["frame_mean"].tolist() == want


# --------------------------------------------------------------------- #
# property-based: arbitrary shapes/content round-trip
# --------------------------------------------------------------------- #

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400),
    ch=st.integers(1, 3),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_property(n, ch, bits, seed):
    rng = np.random.default_rng(seed)
    if bits == 16:
        raw = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
        pcm, _ = decode_wav(encode_wav(raw, bits=16))
        assert np.array_equal(
            np.round(pcm * 32767.0).astype(np.int16), raw
        )
    else:
        raw = rng.integers(0, 256, size=(n, ch), dtype=np.uint8)
        pcm, _ = decode_wav(encode_wav(raw, bits=8))
        assert np.array_equal(
            np.round(pcm * 127.5 + 127.5).astype(np.uint8), raw
        )


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 20),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    k=st.integers(1, 7),
    seed=st.integers(0, 2**31),
)
def test_y4m_roundtrip_property(n, h, w, k, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    buf = encode_y4m(frames, colorspace="mono")
    assert np.array_equal(decode_y4m(buf, every_nth=k), frames[::k])
