"""Multimodal columns — the training-data tier for image/audio/video
(beyond-reference; no analog in gudwls215/vectordb-etl, which is text-only).

Design (per the 100 TB pipeline brief):
- media is an opaque ``binary`` column + typed metadata struct; Spark never
  interprets pixels — partitioning, shuffling, and storage treat it as bytes.
- container METADATA (dimensions, codec, sample rate) is parsed from file
  headers with stdlib ``struct`` — real, tested code (PNG/GIF/JPEG/BMP/WAV).
- pixel/sample DECODE needs image/audio libs absent from this runtime; the
  decode step is stubbed: ``decode_pixels`` raises ``NotImplementedError``
  unless PIL is importable, and ``fake_decode_features`` is the clearly
  marked deterministic stand-in that keeps every Spark-side contract (schema,
  UDF signature, Arrow batch shape, 1→N frame fan-out) real and testable.
- all media UDFs are ``mapInPandas`` — streaming Arrow batches, never
  one-row-at-a-time, and never materializing more than
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs at once. At scale,
  set that down (e.g. 64) so a batch of 4K-image rows fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------------
# container-header parsing (REAL — stdlib struct over public formats)
# --------------------------------------------------------------------------


def parse_image_meta(data: bytes) -> dict:
    """width/height/format from file headers. Pure bytes → no decode libs."""
    out = {"format": None, "width": None, "height": None}
    if not data:
        return out
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        out["format"] = "png"
        out["width"], out["height"] = _struct.unpack(">II", data[16:24])
    elif data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        out["format"] = "gif"
        out["width"], out["height"] = _struct.unpack("<HH", data[6:10])
    elif data[:2] == b"BM" and len(data) >= 26:
        out["format"] = "bmp"
        out["width"], out["height"] = _struct.unpack("<ii", data[18:26])
    elif data[:2] == b"\xff\xd8":
        out["format"] = "jpeg"
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                out["height"], out["width"] = _struct.unpack(
                    ">HH", data[i + 5 : i + 9]
                )
                break
            seg_len = _struct.unpack(">H", data[i + 2 : i + 4])[0]
            i += 2 + seg_len
    return out


def parse_audio_meta(data: bytes) -> dict:
    """WAV RIFF header: channels / sample rate / bits / duration."""
    out = {
        "format": None, "channels": None, "sample_rate": None,
        "bits_per_sample": None, "duration_ms": None,
    }
    if len(data) >= 44 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        out["format"] = "wav"
        channels, rate = _struct.unpack("<HI", data[22:28])
        bits = _struct.unpack("<H", data[34:36])[0]
        out.update(channels=channels, sample_rate=rate, bits_per_sample=bits)
        byte_rate = rate * channels * max(bits, 8) // 8
        if byte_rate:
            out["duration_ms"] = int((len(data) - 44) * 1000 / byte_rate)
    return out


# --------------------------------------------------------------------------
# decode stubs (gated: real lib if present, deterministic fake for tests)
# --------------------------------------------------------------------------


def decode_pixels(data: bytes) -> "np.ndarray":
    """REAL pixel decode — requires PIL, which is not in this runtime.
    Kept as the explicit extension point; everything downstream consumes the
    (H, W, 3) uint8 contract this returns."""
    try:
        from PIL import Image  # noqa: F401
        from io import BytesIO

        return np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    except ImportError as e:
        raise NotImplementedError(
            "pixel decode requires PIL (not installed in this runtime); "
            "use fake_decode_features for deterministic tests"
        ) from e


def fake_decode_features(data: bytes, dim: int = 16) -> list[float]:
    """DETERMINISTIC FAKE decode→feature step (clearly marked): seeded by the
    content hash, L2-normalized, same signature/shape as a real embedding.
    Lets the full pipeline (schema, partitioning, batching) run without
    image libs."""
    seed = int.from_bytes(hashlib.md5(data or b"").digest()[:8], "big") % (2**31)
    v = np.random.RandomState(seed).standard_normal(dim)
    v = v / max(np.linalg.norm(v), 1e-12)
    return [float(x) for x in v]


# --------------------------------------------------------------------------
# Spark operators (mapInPandas — real plumbing)
# --------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def image_features(
    df: DataFrame, dim: int = 16, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Header metadata (real) + feature vector (fake_decode_features stub).
    mapInPandas streams Arrow batches — memory ∝ batch size, not partition."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_image_meta(bytes(b or b"")) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_bytes": [len(bytes(b or b"")) for b in pdf[content_col]],
                    "features": [
                        fake_decode_features(bytes(b or b""), dim)
                        for b in pdf[content_col]
                    ],
                }
            )

    return df.mapInPandas(_gen, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def audio_features(
    df: DataFrame, dim: int = 16, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """WAV header metadata (real) + feature stub; same batching contract."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_audio_meta(bytes(b or b"")) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "format": [m["format"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "features": [
                        fake_decode_features(bytes(b or b""), dim)
                        for b in pdf[content_col]
                    ],
                }
            )

    return df.mapInPandas(_gen, AUDIO_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_offset_bytes", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1 << 16,
    max_frames: int = 16,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling as 1→N fan-out. REAL video demuxing needs codec
    libs (absent); the DETERMINISTIC FAKE slices the byte stream at fixed
    strides — the Spark contract (mapInPandas emitting multiple rows per
    input row, frame bytes as binary) is exactly what a real demuxer keeps."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                data = bytes(blob or b"")
                n = min(max_frames, max(1, -(-len(data) // every_n_bytes)))
                for i in range(n):
                    off = i * every_n_bytes
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    frames.append(data[off : off + every_n_bytes])
            yield pd.DataFrame(
                {
                    "media_id": ids, "frame_index": idxs,
                    "frame_offset_bytes": offs, "frame": frames,
                }
            )

    return df.mapInPandas(_gen, FRAME_SCHEMA)


def media_table(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Normalize any binary-bearing DataFrame into the canonical media schema:
    (media_id, kind, content, meta struct). Kind sniffed from magic bytes
    via real header parsers; pure projection otherwise. The sniff is an
    Arrow-batched pandas UDF like every other Python hop in this module —
    a row-at-a-time ``F.udf`` would pickle each full binary blob per row."""

    def _kind(data: bytes) -> str:
        if parse_image_meta(data)["format"]:
            return "image"
        if parse_audio_meta(data)["format"]:
            return "audio"
        return "binary"

    @F.pandas_udf(StringType())
    def kind_udf(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: _kind(bytes(b or b"")))
    return df.select(
        F.col(id_col).alias("media_id"),
        kind_udf(F.col(content_col)).alias("kind"),
        F.col(content_col).alias("content"),
        F.struct(
            F.length(F.col(content_col)).alias("n_bytes"),
            F.md5(F.col(content_col).cast("string")).alias("content_md5"),
        ).alias("meta"),
    )
