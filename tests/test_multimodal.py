"""Multimodal plumbing: schema/batch shapes, metadata propagation, byte
features on real bytes, strict-mode stub behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cqf_spark.operators.multimodal import (
    extract_features,
    resize_plan,
    sample_frames,
    synth_media,
)


def test_media_schema_and_types(spark, sf_dir):
    m = synth_media(spark, sf_dir)
    assert dict(m.dtypes)["media"] == "binary"
    assert dict(m.dtypes)["media_type"] == "string"
    row = m.first()
    assert row["meta"]["size_bytes"] == len(bytes(row["media"]))
    types = {r[0] for r in m.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_feature_extraction_real_byte_stats(spark, sf_dir):
    m = synth_media(spark, sf_dir).limit(30).cache()
    feats = {r.media_id: r for r in extract_features(m).collect()}
    for row in m.collect():
        buf = bytes(row["media"])
        raw = np.frombuffer(buf, dtype=np.uint8)
        f = feats[row["media_id"]]
        assert f.size_bytes == len(buf)
        assert abs(f.byte_mean - round(float(raw.mean()), 4)) < 1e-9
        assert 0.0 < f.byte_entropy <= 8.0
        if row["media_type"] == "image":
            assert f.feat_dim == row["meta"]["width"] * row["meta"]["height"] * 3
        elif row["media_type"] == "audio":
            assert f.feat_dim == len(buf)
        else:
            assert f.feat_dim == row["meta"]["n_frames"]
    m.unpersist()


def test_strict_mode_raises_not_implemented(spark, sf_dir):
    m = synth_media(spark, sf_dir).where(F.col("media_type") == "image").limit(1)
    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        extract_features(m, strict=True).collect()


def test_frame_sampling(spark, sf_dir):
    m = synth_media(spark, sf_dir)
    sampled = sample_frames(m, every_nth=5)
    rows = sampled.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("mx")
    )
    meta = m.where(F.col("media_type") == "video").select(
        "media_id", F.col("meta.n_frames").alias("nf")
    )
    joined = rows.join(meta, "media_id").collect()
    assert joined
    for r in joined:
        assert r.n == (r.nf + 4) // 5
        assert r.mx <= r.nf - 1 and r.mx % 5 == 0


def test_resize_plan_aspect_preserving(spark, sf_dir):
    plans = resize_plan(synth_media(spark, sf_dir), max_side=32).collect()
    assert plans
    for r in plans:
        assert 1 <= r.out_w <= 32 and 1 <= r.out_h <= 32
        if r.width > 32 or r.height > 32:
            # aspect ratio preserved within floor-rounding (small output
            # dims can shift the ratio by up to ~1/min_dim relatively)
            rel = (r.out_w / r.out_h) / (r.width / r.height)
            assert abs(rel - 1.0) < 1.0 / min(r.out_w, r.out_h) + 0.05
