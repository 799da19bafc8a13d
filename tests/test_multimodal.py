"""Multimodal plumbing tests: real image kernels; deterministic stubs for
audio/video (codec libs absent in sandbox) with real Spark schema/batching."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dedup import imaging, multimodal, synth
from dedup.deploy import ensure_shipped


def test_image_features(spark, synth_parquet):
    ensure_shipped(spark)
    images = spark.read.parquet(synth_parquet).limit(20)
    feats = multimodal.image_features(images).collect()
    assert len(feats) == 20
    stored = {r["image_id"]: r["phash"] for r in images.collect()}
    for r in feats:
        assert r["phash"] == stored[r["image_id"]]  # recompute == stored column
        assert 0.0 <= r["mean_r"] <= 255.0
        assert (r["thumb_w"], r["thumb_h"]) == (8, 8)


def test_audio_features_stub(spark):
    ensure_shipped(spark)
    rows = [("m1", b"payload-a"), ("m2", b"payload-b"), ("m3", b"payload-a")]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    out = {r["media_id"]: r for r in multimodal.audio_features(df).collect()}
    assert len(out) == 3
    # deterministic: identical payloads -> identical features
    assert out["m1"]["rms"] == out["m3"]["rms"]
    assert out["m1"]["rms"] != out["m2"]["rms"]
    assert all(r["n_samples"] == 4096 for r in out.values())


def test_video_frames_stub(spark):
    ensure_shipped(spark)
    df = spark.createDataFrame([("v1", b"vid-a"), ("v2", b"vid-a")], "media_id string, bytes binary")
    out = multimodal.video_frame_phashes(df, n_frames=3).collect()
    assert len(out) == 6
    by = {}
    for r in out:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_phash"]
    assert by["v1"] == by["v2"]  # same payload -> same frames
    assert len(set(by["v1"].values())) == 3  # distinct frames within a video
