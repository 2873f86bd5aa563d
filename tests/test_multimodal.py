"""Multimodal plumbing tests: schema, batch shape, determinism of the stubbed
decode kernels (real Spark path — mapInPandas over binary + struct columns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.multimodal import (
    extract_media_features,
    resize_images,
    sample_video_frames,
    synth_media,
)


def test_extract_media_features(spark):
    media = synth_media(spark, n=30)
    out = extract_media_features(media)
    rows = out.collect()
    assert len(rows) == 30
    r = rows[0]
    assert len(r["embedding"]) == 16
    assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-9  # unit norm
    assert len(r["payload_sha"]) == 64
    # determinism across runs
    again = {x["media_id"]: x["embedding"] for x in extract_media_features(media).collect()}
    assert again[r["media_id"]] == r["embedding"]


def test_resize_images_only_images(spark):
    media = synth_media(spark, n=30)
    out = resize_images(media, 64, 64).collect()
    assert all(r["kind"] == "image" for r in out)
    assert len(out) == 10
    # dimension-dependent output
    out2 = resize_images(media, 32, 32).collect()
    assert out[0]["payload"] != out2[0]["payload"]


def test_sample_video_frames_fanout(spark):
    media = synth_media(spark, n=30)
    out = sample_video_frames(media, every_ms=1000)
    rows = out.collect()
    assert all(0 <= r["frame_index"] and r["ts_ms"] % 1000 == 0 for r in rows)
    per_video = {}
    for r in rows:
        per_video.setdefault(r["media_id"], []).append(r["frame_index"])
    # 3-6s videos at 1fps → 3-6 frames each, contiguous indices
    for frames in per_video.values():
        assert sorted(frames) == list(range(len(frames)))
        assert 3 <= len(frames) <= 6


def test_real_decode_is_marked_unimplemented(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception):
        extract_media_features(media, decode_stub=False).collect()
