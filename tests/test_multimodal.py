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


def test_media_near_dups_finds_perturbed_copies(spark):
    """Perceptual-hash dedup: byte-identical payloads pair at hamming
    0; a one-byte perturbation stays within a small budget (dHash is a
    gradient-sign sketch — one changed byte moves only nearby taps);
    unrelated blobs do not enter the verified pair set at a tight
    budget."""
    from bbdc20_submission_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_near_dups,
        synthetic_media,
    )

    base = synthetic_media(spark, n=12).collect()
    rows = [tuple(r) for r in base]
    exact, perturbed = set(), set()
    for r in base[:4]:
        dup_id = r["media_id"] + 1000
        rows.append((dup_id, r["kind"], r["mime"], r["width"], r["height"],
                     r["duration_ms"], r["payload"]))
        exact.add((r["media_id"], dup_id))
    for r in base[4:8]:
        dup_id = r["media_id"] + 2000
        payload = bytearray(r["payload"])
        payload[3] = (payload[3] + 2) % 256
        rows.append((dup_id, r["kind"], r["mime"], r["width"], r["height"],
                     r["duration_ms"], bytes(payload)))
        perturbed.add((r["media_id"], dup_id))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_near_dups(media, max_hamming=8).collect()
    }
    for pair in exact:
        assert out.get(pair) == 0, (pair, out.get(pair))
    for pair in perturbed:
        assert pair in out and out[pair] <= 8, (pair, out.get(pair))


def test_perceptual_hash_taps_variants(spark):
    """taps controls bit width: taps points -> taps-1 bits (r5 advice:
    non-65 taps used to raise a numpy shape mismatch or silently
    truncate). Out-of-range taps must be rejected up front."""
    import pytest

    from bbdc20_submission_spark.operators.multimodal import (
        perceptual_hash,
        synthetic_media,
    )

    media = synthetic_media(spark, n=6)
    full = {r["_id"]: r["_fp"] for r in perceptual_hash(media, taps=65).collect()}
    small = {r["_id"]: r["_fp"] for r in perceptual_hash(media, taps=33).collect()}
    assert set(full) == set(small) == set(range(6))
    for fp in small.values():  # 32 bits -> always fits unsigned 32
        assert 0 <= fp < (1 << 32)
    for bad in (1, 2, 66, 0, -3):
        with pytest.raises(ValueError, match="taps"):
            perceptual_hash(media, taps=bad)
