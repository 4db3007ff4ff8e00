"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
UDFs.

Two decode paths share one seam (``decode_features(use_real_codecs=...)``):
the default is a **deterministic fake** derived purely from the payload
bytes (sizes, dims, frame counts, md5 feature hash) so SQL oracles can
reproduce it, and ``real_decode`` actually decodes media with pure-stdlib
codecs — PNG (zlib inflate + scanline unfilter), PCM WAV (RIFF parse), and
an NVID container of PNG frames standing in for a video demuxer; heavier
formats (JPEG/mp4) plug into the same seam via optional imports. Everything
Spark-side — schema, batch shape, partitioning, UDF signatures — is real and
is what would carry 100 TB of actual media: the payload stays a binary
column that never leaves the executor, Arrow moves it to Python in columnar
batches, and per-row Python touches only the batch it was handed.

Reference anchor: the pipeline's opaque-blob handling is file download +
copy (ctg_export_league.py:292-309); this generalizes it to typed media.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover - codec libs absent in this environment by design
    import PIL.Image as _PIL  # type: ignore[import-not-found]
except Exception:  # noqa: BLE001
    _PIL = None

MEDIA_TYPES = ("image", "audio", "video")

#: Output schema of decode_features — the contract downstream ops rely on.
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "n_frames int, duration_ms long, feat_hash string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def media_catalog(documents: DataFrame) -> DataFrame:
    """Build a typed media table from the documents corpus: payload is the
    UTF-8 byte encoding of the text (a deterministic stand-in blob), media
    type round-robins by id, metadata is a real struct column."""
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.concat(media_type, F.lit("/fake")).alias("fmt"),
        ).alias("meta"),
    )


def _fake_decode(media_type: str, payload: bytes) -> dict:
    """Deterministic fake decode: every value is pure integer arithmetic on
    the byte length plus an md5 over the bytes, so a SQL oracle can
    reproduce it bit-for-bit."""
    n = len(payload)
    width = 16 + n % 64 if media_type in ("image", "video") else 0
    height = 16 + (n * 7) % 64 if media_type in ("image", "video") else 0
    if media_type == "image":
        n_frames = 1
    elif media_type == "video":
        n_frames = 1 + n % 24
    else:
        n_frames = 0
    duration_ms = n if media_type in ("audio", "video") else 0
    return {
        "n_bytes": n,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "feat_hash": hashlib.md5(payload).hexdigest(),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: Minimal video container for the real-decode path: magic, frame count,
#: then length-prefixed PNG frames at a fixed 25 fps. A stand-in for a real
#: demuxer (pyav) with the same decode shape: parse container -> per-frame
#: image decode.
_NVID_MAGIC = b"NVID"


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytes:
    """Reverse PNG scanline filtering (types 0-4, 8-bit samples) — the part
    of PNG decode zlib doesn't do. Returns the raw pixel bytes."""
    stride = width * channels
    bpp = channels
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out += line
        prev = line
    return bytes(out)


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decode (8-bit, non-interlaced, color types 0/2/4/6):
    returns (width, height, pixel_bytes). zlib handles the inflate; chunk
    walking and scanline unfiltering are ~40 lines of struct arithmetic."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, channels, idat = 8, 0, 0, 0, b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise ValueError("unsupported PNG variant")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    pixels = _png_unfilter(zlib.decompress(idat), width, height, channels)
    return width, height, pixels


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib RIFF/WAVE parse: returns (sample_rate, n_channels,
    duration_ms, pcm_bytes) for PCM WAV."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, n_ch, bits, pcm = 12, 0, 0, 0, b""
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if cid == b"fmt ":
            _fmt, n_ch, rate, _byps, _align, bits = struct.unpack("<HHIIHH", data[:16])
        elif cid == b"data":
            pcm = data
    if not rate or not n_ch or not bits:
        raise ValueError("WAV missing fmt chunk")
    n_samples = len(pcm) // (n_ch * (bits // 8))
    return rate, n_ch, n_samples * 1000 // rate, pcm


def decode_nvid(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse the NVID container (magic ∥ u32 frame count ∥ length-prefixed
    PNG frames, 25 fps): returns (width, height, n_frames, all_pixel_bytes)."""
    if payload[:4] != _NVID_MAGIC:
        raise ValueError("not an NVID payload")
    (n_frames,) = struct.unpack(">I", payload[4:8])
    pos, width, height, pixels = 8, 0, 0, b""
    for _ in range(n_frames):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        w, h, px = decode_png(payload[pos + 4 : pos + 4 + length])
        width, height = w, h
        pixels += px
        pos += 4 + length
    return width, height, n_frames, pixels


def encode_png(width: int, height: int, pixels: bytes, color: int = 2) -> bytes:
    """Minimal PNG encoder (filter-0 scanlines, 8-bit) — the sink half of
    the real-codec seam; ``decode_png`` round-trips it exactly."""
    channels = _PNG_CHANNELS[color]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")

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
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav(rate: int, n_channels: int, pcm: bytes) -> bytes:
    """Minimal PCM-16 WAV encoder; ``decode_wav`` round-trips it exactly."""
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, rate * n_channels * 2, n_channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_nvid(frames: list[tuple[int, int, bytes]]) -> bytes:
    """NVID container encoder: length-prefixed PNG frames at 25 fps."""
    out = _NVID_MAGIC + struct.pack(">I", len(frames))
    for width, height, pixels in frames:
        png = encode_png(width, height, pixels)
        out += struct.pack(">I", len(png)) + png
    return out


def real_decode(media_type: str, payload: bytes) -> dict:
    """The real-codec decode path: same output contract as ``_fake_decode``
    but every value comes from actually decoding the payload — PNG via
    zlib+unfilter, WAV via RIFF parse, video via the NVID demux. feat_hash
    is the md5 of the DECODED pixels/PCM (content-addressed features), not
    of the container bytes. Heavier codecs (JPEG/FLAC/mp4) drop into the
    same seam via optional imports (PIL is tried above)."""
    n = len(payload)
    if media_type == "image":
        if _PIL is not None and payload[:8] != _PNG_SIG:  # pragma: no cover
            import io

            img = _PIL.open(io.BytesIO(payload))
            pixels = img.tobytes()
            return {
                "n_bytes": n, "width": img.width, "height": img.height,
                "n_frames": 1, "duration_ms": 0,
                "feat_hash": hashlib.md5(pixels).hexdigest(),
            }
        width, height, pixels = decode_png(payload)
        return {
            "n_bytes": n, "width": width, "height": height, "n_frames": 1,
            "duration_ms": 0, "feat_hash": hashlib.md5(pixels).hexdigest(),
        }
    if media_type == "audio":
        _rate, _n_ch, duration_ms, pcm = decode_wav(payload)
        return {
            "n_bytes": n, "width": 0, "height": 0, "n_frames": 0,
            "duration_ms": duration_ms,
            "feat_hash": hashlib.md5(pcm).hexdigest(),
        }
    if media_type == "video":
        width, height, n_frames, pixels = decode_nvid(payload)
        return {
            "n_bytes": n, "width": width, "height": height,
            "n_frames": n_frames, "duration_ms": n_frames * 40,
            "feat_hash": hashlib.md5(pixels).hexdigest(),
        }
    raise ValueError(f"unknown media type {media_type!r}")


def decode_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas). One Python
    call per ~10k-row batch, not per row; the binary column arrives as a
    zero-copy Arrow buffer. Partitioning is inherited — at 100 TB run this
    straight after the scan so no shuffle precedes the (CPU-bound) decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decode = real_decode if use_real_codecs else _fake_decode
            feats = [
                {"doc_id": d, "media_type": mt, **decode(mt, p)}
                for d, mt, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(feats)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_plan(features: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize planning (the metadata half of a real resize): clamp the long
    side to ``max_dim`` preserving aspect ratio, integer arithmetic only.
    The pixel work would happen in the same mapInPandas pass as decode."""
    scale_num = F.least(F.lit(max_dim), F.greatest("width", "height"))
    scale_den = F.greatest(F.col("width"), F.col("height"), F.lit(1))
    return features.withColumn(
        "out_width", (F.col("width") * scale_num / scale_den).cast("int")
    ).withColumn("out_height", (F.col("height") * scale_num / scale_den).cast("int"))


def sample_frames(
    media: DataFrame, stride: int = 4, use_real_codecs: bool = False
) -> DataFrame:
    """Frame sampling UDTF shape: one input video row → N output frame rows
    (every ``stride``-th frame), via mapInPandas so a single Python pass
    both decodes and fans out.

    Fake path: frame count is the deterministic 1 + n % 24 and frame_hash is
    md5(payload ∥ ':' ∥ idx) — oracle-reproducible without any codec. Real
    path (``use_real_codecs=True``): the NVID container is DEMUXED — the
    frame walk reads each length prefix but only DECODES the sampled
    frames, which is the whole point of frame sampling at 100 TB (seek cost
    per frame, decode cost only for the kept ones) — and frame_hash is the
    md5 of the frame's decoded pixels (content-addressed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for d, mt, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video":
                    continue
                p = bytes(p)
                if use_real_codecs:
                    if p[:4] != _NVID_MAGIC:
                        raise ValueError("not an NVID payload")
                    (n_frames,) = struct.unpack(">I", p[4:8])
                    pos = 8
                    for idx in range(n_frames):
                        (length,) = struct.unpack(">I", p[pos : pos + 4])
                        if idx % stride == 0:
                            _w, _h, px = decode_png(p[pos + 4 : pos + 4 + length])
                            out.append(
                                {
                                    "doc_id": d,
                                    "frame_idx": idx,
                                    "frame_hash": hashlib.md5(px).hexdigest(),
                                }
                            )
                        pos += 4 + length
                    continue
                n_frames = 1 + len(p) % 24
                for idx in range(0, n_frames, stride):
                    out.append(
                        {
                            "doc_id": d,
                            "frame_idx": idx,
                            "frame_hash": hashlib.md5(
                                p + b":" + str(idx).encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_hash"])

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
