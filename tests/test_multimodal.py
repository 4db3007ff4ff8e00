"""Multimodal operator tests: media catalog typing, fake-decode contract,
UDTF fan-out shape, resize arithmetic, and the stubbed real-codec seam."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.multimodal import (
    decode_features,
    media_catalog,
    real_decode,
    resize_plan,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (0, "an image payload here"),
            (1, "audio bytes"),
            (2, "a video payload with more bytes in it"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    return media_catalog(docs)


def test_media_catalog_types_and_metadata(media):
    rows = {r.doc_id: r for r in media.collect()}
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"
    assert isinstance(rows[0].payload, bytearray | bytes)
    assert rows[0].meta.n_bytes == len("an image payload here")
    assert rows[2].meta.fmt == "video/fake"
    # payload is the UTF-8 encoding of the text
    assert bytes(rows[1].payload) == b"audio bytes"


def test_decode_features_contract(media):
    feats = {r.doc_id: r for r in decode_features(media).collect()}
    n = len("an image payload here")
    assert feats[0].n_bytes == n
    assert feats[0].width == 16 + n % 64
    assert feats[0].height == 16 + (n * 7) % 64
    assert feats[0].n_frames == 1
    assert feats[0].duration_ms == 0
    assert feats[0].feat_hash == hashlib.md5(b"an image payload here").hexdigest()
    # audio has no dims, has duration
    assert (feats[1].width, feats[1].height) == (0, 0)
    assert feats[1].duration_ms == len(b"audio bytes")
    # video frame count
    nv = len("a video payload with more bytes in it")
    assert feats[2].n_frames == 1 + nv % 24


def test_sample_frames_fanout(media):
    frames = sample_frames(media, stride=4).collect()
    # only video rows fan out
    assert {r.doc_id for r in frames} == {2}
    nv = len("a video payload with more bytes in it")
    expected = list(range(0, 1 + nv % 24, 4))
    assert sorted(r.frame_idx for r in frames) == expected
    payload = "a video payload with more bytes in it".encode()
    first = next(r for r in frames if r.frame_idx == 0)
    assert first.frame_hash == hashlib.md5(payload + b":0").hexdigest()


def test_resize_preserves_aspect_and_clamps(spark):
    feats = spark.createDataFrame(
        [(1, 64, 16), (2, 16, 16), (3, 0, 0)],
        "doc_id long, width int, height int",
    )
    out = {r.doc_id: r for r in resize_plan(feats, max_dim=32).collect()}
    assert (out[1].out_width, out[1].out_height) == (32, 8)  # 64x16 -> 32x8
    assert (out[2].out_width, out[2].out_height) == (16, 16)  # under cap: kept
    assert (out[3].out_width, out[3].out_height) == (0, 0)  # degenerate safe


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode("image", b"\x89PNG")
