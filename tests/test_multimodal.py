"""Multimodal plumbing tests: binary schema, Arrow batch shape, stub
boundary honesty."""

from __future__ import annotations

import pytest

from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    frame_sample,
    media_features,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table


def test_media_schema_is_binary(spark, sf_dir):
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    dtypes = dict(media.dtypes)
    assert dtypes["blob"] == "binary"
    assert dtypes["media_type"] == "string"


def test_media_features_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = media_features(media)
    row = feats.filter("doc_id = 0").collect()[0]
    text0 = docs.filter("doc_id = 0").collect()[0]["text"]
    assert row["n_bytes"] == len(text0.encode("utf-8"))
    assert 1 <= row["decoded_w"] <= 97
    assert feats.count() == docs.count()


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_explodes(spark, sf_dir):
    media = attach_fake_media(load_table(spark, sf_dir, "documents")).limit(20)
    frames = frame_sample(media, every_n=10)
    rows = frames.collect()
    assert rows
    for r in rows:
        assert r["frame_idx"] < r["n_frames"]
        assert r["frame_idx"] % 10 == 0
