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


def test_sample_frames_real_demux_decodes_sampled_frames(spark):
    """Real-codec path: the NVID walk must land on exact frame boundaries
    (varying per-frame PNG sizes) and hash each SAMPLED frame's decoded
    pixels — not the container bytes."""
    from nba_data_pipeline_spark.operators.multimodal import encode_nvid

    # frames with different content → different compressed PNG lengths
    frame_px = [bytes([i]) * 96 + bytes(range(i, i + 10)) * 0 for i in range(6)]
    frame_px = [bytes([i]) * 96 for i in range(6)]
    payload = encode_nvid([(8, 4, px) for px in frame_px])
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload)), (8, "image", bytearray(b"x"))],
        "doc_id long, media_type string, payload binary",
    )
    rows = sample_frames(media, stride=2, use_real_codecs=True).collect()
    assert {r.doc_id for r in rows} == {7}
    got = {r.frame_idx: r.frame_hash for r in rows}
    assert sorted(got) == [0, 2, 4]
    for idx in (0, 2, 4):
        assert got[idx] == hashlib.md5(frame_px[idx]).hexdigest()


def test_resize_preserves_aspect_and_clamps(spark):
    feats = spark.createDataFrame(
        [(1, 64, 16), (2, 16, 16), (3, 0, 0)],
        "doc_id long, width int, height int",
    )
    out = {r.doc_id: r for r in resize_plan(feats, max_dim=32).collect()}
    assert (out[1].out_width, out[1].out_height) == (32, 8)  # 64x16 -> 32x8
    assert (out[2].out_width, out[2].out_height) == (16, 16)  # under cap: kept
    assert (out[3].out_width, out[3].out_height) == (0, 0)  # degenerate safe


def _encode_png(width: int, height: int, pixels: bytes, color: int = 2) -> bytes:
    """Minimal PNG encoder (filter 0 scanlines) — fixture-side twin of
    operators.multimodal.decode_png."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    stride = width * channels

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _encode_wav(rate: int, n_channels: int, pcm: bytes) -> bytes:
    import struct

    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, rate * n_channels * 2, n_channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_decode_png_wav_nvid(spark):
    import struct

    px = bytes(range(4 * 3 * 3))  # 4x3 RGB
    png = _encode_png(4, 3, px)
    pcm = bytes(200)  # 100 samples of 16-bit mono
    wav = _encode_wav(8000, 1, pcm)
    frame = _encode_png(2, 2, bytes(12))
    nvid = (
        b"NVID" + struct.pack(">I", 2)
        + struct.pack(">I", len(frame)) + frame
        + struct.pack(">I", len(frame)) + frame
    )
    media = spark.createDataFrame(
        [(0, "image", png), (1, "audio", wav), (2, "video", nvid)],
        "doc_id long, media_type string, payload binary",
    )
    feats = {r.doc_id: r for r in decode_features(media, use_real_codecs=True).collect()}
    assert (feats[0].width, feats[0].height, feats[0].n_frames) == (4, 3, 1)
    assert feats[0].feat_hash == hashlib.md5(px).hexdigest()
    assert (feats[1].width, feats[1].height) == (0, 0)
    assert feats[1].duration_ms == 100 * 1000 // 8000
    assert feats[1].feat_hash == hashlib.md5(pcm).hexdigest()
    assert (feats[2].width, feats[2].height, feats[2].n_frames) == (2, 2, 2)
    assert feats[2].duration_ms == 80
    assert feats[2].feat_hash == hashlib.md5(bytes(12) * 2).hexdigest()


def test_real_decode_unfilters_all_png_filter_types():
    """Round-trip a PNG whose scanlines use filters 1-4 (encoded by applying
    the forward filter, decoded by real_decode's unfilter)."""
    import struct
    import zlib

    width, height, channels = 5, 4, 3
    stride = width * channels
    pixels = bytes((i * 37 + 11) % 256 for i in range(stride * height))
    rows = [bytearray(pixels[y * stride : (y + 1) * stride]) for y in range(height)]
    filtered = b""
    prev = bytearray(stride)
    for y, ftype in enumerate((1, 2, 3, 4)):
        cur = rows[y]
        line = bytearray(cur)
        for i in range(stride):
            a = cur[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 1:
                line[i] = (cur[i] - a) & 0xFF
            elif ftype == 2:
                line[i] = (cur[i] - b) & 0xFF
            elif ftype == 3:
                line[i] = (cur[i] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (cur[i] - pred) & 0xFF
        filtered += bytes([ftype]) + bytes(line)
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(filtered))
        + chunk(b"IEND", b"")
    )
    out = real_decode("image", png)
    assert out["feat_hash"] == hashlib.md5(pixels).hexdigest()


def test_real_decode_rejects_garbage():
    with pytest.raises(ValueError):
        real_decode("image", b"\x89PNG but not really")
    with pytest.raises(ValueError):
        real_decode("audio", b"not a riff")
