"""MP3 frame demux and MP4 sample-table demux (functions/mp3.py,
functions/mp4.py): synthesized containers round-trip their planted
payload boundaries byte-identically; durations/bitrates match
pen-and-paper arithmetic; dispatch signatures reject lookalikes."""

import numpy as np
import pytest

from cqf_spark.functions.mp3 import demux_mp3, is_mp3, synth_mp3
from cqf_spark.functions.mp4 import demux_mp4, is_mp4, synth_mp4


# --------------------------------------------------------------------- #
# MP3
# --------------------------------------------------------------------- #

def test_mp3_chain_walk_and_duration():
    # MPEG1 Layer III, br_idx 9 = 128 kbps, sr_idx 0 = 44100 Hz
    blob = synth_mp3(30, br_idx=9, sr_idx=0)
    assert is_mp3(blob)
    d = demux_mp3(blob)
    assert d["n_frames"] == 30
    assert d["sample_rate"] == 44100
    assert d["avg_bitrate_kbps"] == 128.0
    # 30 frames x 1152 samples at 44100 Hz
    assert abs(d["duration_s"] - 30 * 1152 / 44100) < 1e-6
    # frame offsets: unpadded 417, padded 418 (144*128000/44100 = 417.96)
    deltas = np.diff(d["frame_offsets"])
    assert set(deltas.tolist()) == {417, 418}


def test_mp3_id3_and_mpeg2():
    blob = synth_mp3(8, br_idx=5, sr_idx=1, mpeg1=False,
                     id3=b"x" * 333)
    d = demux_mp3(blob)
    # MPEG2 L3: 576 samples, sr_idx 1 = 24000 Hz, br_idx 5 = 40 kbps
    assert d["n_frames"] == 8
    assert d["sample_rate"] == 24000
    assert abs(d["duration_s"] - 8 * 576 / 24000) < 1e-6
    assert d["frame_offsets"][0] == 10 + 333  # ID3v2 skipped


def test_mp3_rejects_lookalikes():
    assert not is_mp3(b"\xff\xe3garbage that is not a frame chain" * 3)
    assert not is_mp3(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        demux_mp3(b"\x00" * 64)
    # truncated chain still reports the frames that do parse
    blob = synth_mp3(5)
    d = demux_mp3(blob + b"ID3v1tag-not-a-frame")
    assert d["n_frames"] == 5


# --------------------------------------------------------------------- #
# MP4
# --------------------------------------------------------------------- #

def _payloads(n, seed=0):
    rng = np.random.default_rng(seed)
    return [bytes(rng.integers(0, 256, int(rng.integers(5, 40)),
                               dtype=np.uint8)) for _ in range(n)]


@pytest.mark.parametrize("n,spc", [(1, 3), (7, 3), (9, 3), (10, 4)])
def test_mp4_samples_recover_byte_identical(n, spc):
    pays = _payloads(n, seed=n)
    blob = synth_mp4(pays, timescale=1000, delta=40,
                     samples_per_chunk=spc)
    assert is_mp4(blob)
    d = demux_mp4(blob)
    assert d["n_samples"] == n
    assert abs(d["duration_s"] - n * 0.040) < 1e-9
    for i in range(n):
        o, s = int(d["offsets"][i]), int(d["sizes"][i])
        assert blob[o : o + s] == pays[i]
        assert abs(d["times_s"][i] - i * 0.040) < 1e-9


def test_mp4_rejects_lookalikes():
    assert not is_mp4(b"RIFF" + b"\x00" * 20)
    assert not is_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError):
        demux_mp4(b"\x00\x00\x00\x0cftypisom" + b"\x00" * 4)  # no moov


def test_mp4_malformed_tables_fail_loud():
    pays = _payloads(4, seed=1)
    blob = bytearray(synth_mp4(pays))
    # corrupt stsz's count field (box: type at i, body at i+4,
    # version/flags i+4..8, fixed-size i+8..12, count i+12..16)
    i = bytes(blob).find(b"stsz")
    blob[i + 12 : i + 16] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError, match="stsz"):
        demux_mp4(bytes(blob))


def test_spark_extract_features_demuxes_mp3_mp4(spark):
    """extract_features: real frame/sample counts for mp3/mp4 rows in
    strict mode (no stub raise); pixel_mean stays NaN — the payload is
    demuxed, not decoded."""
    from cqf_spark.operators.multimodal import extract_features

    mp3_blob = synth_mp3(12)
    mp4_blob = synth_mp4(_payloads(7, seed=3))
    rows = [
        (0, "audio", mp3_blob,
         (len(mp3_blob), None, None, None, 44100, None, None)),
        (1, "video", mp4_blob,
         (len(mp4_blob), None, None, None, None, 7, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, media_type string, media binary, "
        "meta struct<size_bytes: long, width: int, height: int, "
        "channels: int, sample_rate: int, n_frames: int, "
        "duration_s: double>",
    )
    out = {r["media_id"]: r
           for r in extract_features(df, strict=True).collect()}
    assert out[0]["feat_dim"] == 12          # mp3 frames
    assert out[1]["feat_dim"] == 7           # mp4 samples
    # demux only, no decode: NaN -> SQL null through Arrow
    assert out[0]["pixel_mean"] is None
    assert out[1]["pixel_mean"] is None


def test_spark_extract_features_degrades_on_truncated_bodies(spark):
    """A signature match with a broken body (ftyp but no moov; PNG magic
    with garbage chunks) must degrade to the metadata stub in non-strict
    mode — one bad crawl item cannot abort the task — and still raise in
    strict mode."""
    from cqf_spark.operators.multimodal import extract_features

    bad_mp4 = b"\x00\x00\x00\x0cftypisom" + b"\x00" * 64  # no moov
    bad_png = bytes.fromhex("89504e470d0a1a0a") + b"\xff" * 64
    rows = [
        (0, "video", bad_mp4,
         (len(bad_mp4), None, None, None, None, 9, None)),
        (1, "image", bad_png,
         (len(bad_png), 4, 3, 3, None, None, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, media_type string, media binary, "
        "meta struct<size_bytes: long, width: int, height: int, "
        "channels: int, sample_rate: int, n_frames: int, "
        "duration_s: double>",
    )
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert out[0]["feat_dim"] == 9           # metadata n_frames fallback
    assert out[1]["feat_dim"] == 4 * 3 * 3   # metadata w*h*3 fallback
    assert out[0]["pixel_mean"] is None
    assert out[1]["pixel_mean"] is None
    with pytest.raises(Exception):
        extract_features(df, strict=True).collect()
