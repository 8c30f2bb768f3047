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


def test_media_near_dups_forced_hot_bounded_and_connected(spark):
    """r12 (VERDICT #4): at a FORCED-HOT configuration — one asset
    mass-duplicated far past bucket_cap, media_near_dups' bounded
    default — the emitted pair count must stay well under the
    quadratic C(n,2) while the dup family stays ONE connected
    component (the keep-one-blob-per-family contract), and far-away
    blobs never pair in."""
    from bbdc20_submission_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_near_dups,
    )

    # m = ceil(600/8) = 75 subs per hot bucket: expected kept fraction
    # ~1-(1-4/75)^3 ~ 15% of C(n,2) (4 probe rounds, 3 independent
    # band trials) plus chain edges — the 35% bound has >2x margin
    # while the quadratic plan would emit 100%
    n_fam = 600
    asset = bytes(((j * 37) % 256) for j in range(96))
    rows = [
        (i, "image", "image/png", 64, 48, None, asset) for i in range(n_fam)
    ]
    for k in range(5):
        # unrelated blobs: different byte patterns -> distant dHash
        other = bytes(((j * (41 + 8 * k) + k) % 256) for j in range(96))
        rows.append((9000 + k, "image", "image/png", 64, 48, None, other))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = media_near_dups(media, max_hamming=4, bucket_cap=8).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    # ground truth from the fingerprints themselves: every emitted
    # pair must be within budget (no sampling artifact ever
    # fabricates a pair)
    from bbdc20_submission_spark.operators.multimodal import (
        perceptual_hash,
    )

    fps = {r["_id"]: r["_fp"] & ((1 << 64) - 1)
           for r in perceptual_hash(media).collect()}
    assert pairs and all(
        bin(fps[a] ^ fps[b]).count("1") <= 4 for a, b in pairs
    )
    assert len(pairs) < 0.35 * (n_fam * (n_fam - 1) / 2), len(pairs)
    pairs = [(a, b) for a, b in pairs if a < n_fam and b < n_fam]
    parent = list(range(n_fam))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n_fam)}) == 1


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
