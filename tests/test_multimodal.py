"""Multimodal plumbing: schema, batch shape, determinism of the
stubbed decode path."""

from __future__ import annotations

import pytest

from bbdc20_submission_spark.operators.multimodal import (
    decode_image_strict,
    extract_features,
    frame_sample_stub,
    synthetic_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synthetic_media(spark, n=12)
    out1 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    out2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert out1 == out2  # deterministic
    assert set(out1) == set(range(12))
    for feat in out1.values():
        assert len(feat) == 8
        assert abs(sum(feat) - 1.0) < 1e-9  # normalized histogram


def test_frame_sampling_counts(spark):
    media = synthetic_media(spark, n=12)
    frames = frame_sample_stub(media, every_ms=500).collect()
    vids = {r["media_id"] for r in frames}
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'video'").collect()
    }
    assert vids == set(durations)
    for mid, dur in durations.items():
        n = sum(1 for r in frames if r["media_id"] == mid)
        assert n == dur // 500 + 1


def test_strict_decode_raises():
    with pytest.raises(NotImplementedError):
        decode_image_strict(b"xx")
