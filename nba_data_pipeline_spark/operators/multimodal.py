"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
UDFs.

The container has no codec libraries, so the decode step is STUBBED: real
decoding raises ``NotImplementedError`` unless the optional import succeeds,
and the default path computes a **deterministic fake** derived purely from
the payload bytes (sizes, dims, frame counts, md5 feature hash). Everything
Spark-side — schema, batch shape, partitioning, UDF signatures — is real and
is what would carry 100 TB of actual media: the payload stays a binary
column that never leaves the executor, Arrow moves it to Python in columnar
batches, and per-row Python touches only the batch it was handed.

Reference anchor: the pipeline's opaque-blob handling is file download +
copy (ctg_export_league.py:292-309); this generalizes it to typed media.
"""

from __future__ import annotations

import hashlib
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


def real_decode(media_type: str, payload: bytes):  # pragma: no cover
    """The real decode seam. Wire PIL/torchaudio/pyav here when available."""
    if _PIL is None:
        raise NotImplementedError(
            "codec libraries are not installed in this environment; "
            "decode_features uses the deterministic fake instead"
        )
    raise NotImplementedError("real decode not implemented for " + media_type)


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


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling UDTF shape: one input video row → N output frame rows
    (every ``stride``-th frame), via mapInPandas so a single Python pass
    both 'decodes' and fans out. frame_hash is md5(payload ∥ ':' ∥ idx) —
    deterministic and oracle-reproducible."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for d, mt, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video":
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
