"""Multimodal plumbing: mapInPandas feature extraction with the fake decoder,
stub decoder loudness, exact-dup channel on binary payloads."""

from __future__ import annotations

import pytest

from cloud_dedup_spark.operators.multimodal import (
    FakeDecoder,
    StubDecoder,
    exact_media_duplicates,
    extract_features,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media(spark, n=48, seed=42, dup_every=8).cache()
    df.count()
    return df


def test_feature_extraction_shape(spark, media):
    feats = extract_features(media, FakeDecoder()).collect()
    assert len(feats) == 48
    for r in feats:
        assert len(r["content_sha256"]) == 64
        assert r["n_bytes"] == 256
        assert len(r["feature"]) == FakeDecoder.dim


def test_features_deterministic_per_content(spark, media):
    feats = extract_features(media, FakeDecoder()).collect()
    by_sha = {}
    for r in feats:
        by_sha.setdefault(r["content_sha256"], set()).add(tuple(r["feature"]))
    for sha, vecs in by_sha.items():
        assert len(vecs) == 1  # same bytes → same feature everywhere


def test_exact_media_duplicates(spark, media):
    feats = extract_features(media, FakeDecoder())
    groups = exact_media_duplicates(feats).collect()
    assert len(groups) == 1  # the planted every-8th duplicate family
    assert groups[0]["media_ids"] == [0, 8, 16, 24, 32, 40]


def test_stub_decoder_is_loud(spark, media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        extract_features(media, StubDecoder()).collect()
    assert "NotImplementedError" in str(exc.value) or "media decode" in str(exc.value)
