"""Multimodal columns — the training-data tier for image/audio/video
(beyond-reference; no analog in gudwls215/vectordb-etl, which is text-only).

Design (per the 100 TB pipeline brief):
- media is an opaque ``binary`` column + typed metadata struct; Spark never
  interprets pixels — partitioning, shuffling, and storage treat it as bytes.
- container METADATA (dimensions, codec, sample rate) is parsed from file
  headers with stdlib ``struct`` — real, tested code (PNG/GIF/JPEG/BMP/WAV).
- pixel/sample DECODE is REAL for the public uncompressed formats: 24-bpp
  BMP (``decode_bmp_pixels``) and PCM WAV (``decode_wav_samples``) are
  pure-stdlib ``struct``/numpy readers implemented from the public
  [MS-WMF]/RIFF specs — same stance as the CFB reader in sources/hwp.py.
  ``decode_pixels`` routes BMP to the stdlib decoder and other formats to
  PIL when importable; compressed formats without PIL raise
  ``NotImplementedError``. ``fake_decode_features`` remains the clearly
  marked deterministic stand-in for formats whose codecs are absent.
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
# pixel/sample decode (REAL for uncompressed public formats; PIL-gated
# fallback for compressed ones)
# --------------------------------------------------------------------------


def decode_bmp_pixels(data: bytes) -> "np.ndarray":
    """REAL 24-bpp uncompressed BMP decode, pure stdlib+numpy — implemented
    from the public BITMAPFILEHEADER/BITMAPINFOHEADER layout (no reference
    counterpart; gudwls215/vectordb-etl is text-only). Returns the (H, W, 3)
    uint8 RGB contract every downstream feature step consumes. Handles
    bottom-up (positive height) and top-down (negative height) row order
    and 4-byte row padding; rejects compressed or non-24-bpp files."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pix_off = _struct.unpack("<I", data[10:14])[0]
    w, h = _struct.unpack("<ii", data[18:26])
    bpp = _struct.unpack("<H", data[28:30])[0]
    compression = _struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) & ~3
    need = pix_off + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} bytes, need {need}")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    # stored order is BGR → return RGB
    return rows[:, :, ::-1].copy()


def decode_wav_samples(data: bytes) -> tuple["np.ndarray", int]:
    """REAL PCM WAV decode, pure stdlib+numpy: walks RIFF chunks (not a
    fixed 44-byte assumption — handles LIST/fact chunks before data),
    supports 8- and 16-bit integer PCM. Returns ``(samples, sample_rate)``
    where samples is (n_frames, channels) int16 (8-bit input is widened to
    centered int16: (v-128)<<8)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = _struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt = _struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"only 8/16-bit integer PCM supported (format={audio_format}, "
            f"bits={bits})"
        )
    if bits == 16:
        flat = np.frombuffer(
            payload, dtype="<i2", count=len(payload) // 2
        ).astype(np.int16)
    else:
        flat = (
            (np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - 128)
            << 8
        )
    n = (len(flat) // channels) * channels
    return flat[:n].reshape(-1, channels), rate


def decode_pixels(data: bytes) -> "np.ndarray":
    """Pixel decode front door: uncompressed BMP decodes via the pure-stdlib
    reader above (always available); other formats route to PIL when
    importable. Everything downstream consumes the (H, W, 3) uint8 RGB
    contract this returns."""
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    try:
        from PIL import Image  # noqa: F401
        from io import BytesIO

        return np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    except ImportError as e:
        raise NotImplementedError(
            "decoding compressed formats requires PIL (not installed in "
            "this runtime); BMP decodes without it — or use "
            "fake_decode_features for deterministic tests"
        ) from e


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Write (H, W, 3) uint8 RGB as a 24-bpp bottom-up BMP — the encode
    twin of ``decode_bmp_pixels`` (used by tests and the driver's synthetic
    round-trip query; also handy for emitting debug tiles at scale)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = (3 * w + 3) & ~3
    pad = stride - 3 * w
    # RGB → BGR, top row last (bottom-up)
    bgr = arr[::-1, :, ::-1]
    body = b"".join(
        bgr[r].tobytes() + b"\x00" * pad for r in range(h)
    )
    info = _struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    header = _struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
    return header + info + body


def encode_wav(samples: "np.ndarray", rate: int) -> bytes:
    """Write (n_frames, channels) int16 PCM as a canonical RIFF/WAVE file —
    the encode twin of ``decode_wav_samples``."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    payload = arr.tobytes()
    byte_rate = rate * channels * 2
    hdr = (
        b"RIFF" + _struct.pack("<I", 36 + len(payload)) + b"WAVEfmt "
        + _struct.pack(
            "<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * 2, 16
        )
        + b"data" + _struct.pack("<I", len(payload))
    )
    return hdr + payload


def fake_decode_features(data: bytes, dim: int = 16) -> list[float]:
    """DETERMINISTIC FAKE decode→feature step (clearly marked): seeded by the
    content hash, L2-normalized, same signature/shape as a real embedding.
    The stand-in for formats whose codecs are absent (JPEG/PNG without PIL);
    BMP/WAV get REAL features via ``pixel_features``/``decode_pixels``."""
    seed = int.from_bytes(hashlib.md5(data or b"").digest()[:8], "big") % (2**31)
    v = np.random.RandomState(seed).standard_normal(dim)
    v = v / max(np.linalg.norm(v), 1e-12)
    return [float(x) for x in v]


def pixel_features(px: "np.ndarray", dim: int = 16) -> list[float]:
    """REAL image features from decoded (H, W, 3) uint8 pixels: per-channel
    means and stds plus a (dim-6)-bin luminance histogram, L2-normalized —
    the classic pre-embedding visual signature, computed entirely from
    decoded values."""
    flat = px.reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0) / 255.0
    stds = flat.std(axis=0) / 255.0
    lum = flat @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=max(dim - 6, 1), range=(0.0, 255.0))
    hist = hist / max(hist.sum(), 1)
    v = np.concatenate([means, stds, hist])[:dim]
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    v = v / max(np.linalg.norm(v), 1e-12)
    return [float(x) for x in v]


def image_feature_vector(data: bytes, dim: int = 16) -> list[float]:
    """Decode→feature front door used by ``image_features``: REAL decoded
    features when the format is decodable in this runtime (always true for
    BMP), the clearly-marked deterministic fake otherwise."""
    try:
        return pixel_features(decode_pixels(data), dim)
    except (NotImplementedError, ValueError):
        return fake_decode_features(data, dim)


def audio_feature_vector(data: bytes, dim: int = 16) -> list[float]:
    """REAL audio features from decoded PCM when the clip is PCM WAV —
    global mean/std plus per-segment RMS energy over (dim-2) equal time
    slices, L2-normalized; the deterministic fake for undecodable codecs."""
    try:
        samples, _ = decode_wav_samples(data)
    except ValueError:
        return fake_decode_features(data, dim)
    if samples.size == 0:
        return [0.0] * dim
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    segs = np.array_split(mono, max(dim - 2, 1))
    rms = [float(np.sqrt(np.mean(s * s))) if s.size else 0.0 for s in segs]
    v = np.array([float(mono.mean()), float(mono.std())] + rms)[:dim]
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    norm = np.linalg.norm(v)
    v = v / norm if norm > 1e-12 else v
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
                        image_feature_vector(bytes(b or b""), dim)
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
                        audio_feature_vector(bytes(b or b""), dim)
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


IMAGE_PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
    ]
)


def image_pixel_stats(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-image channel statistics from REAL decoded pixels
    (``decode_pixels`` — stdlib BMP path needs no external libs). Integer
    channel sums are exact, so the result is hash-comparable against a SQL
    oracle that states the same pixel arithmetic. mapInPandas streams Arrow
    batches; memory ∝ batch size × image size. The id column keeps its
    input name AND type (derived from ``df.schema[id_col]``, not
    hard-coded long)."""
    id_field = df.schema[id_col]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, rs, gs, bs = [], [], [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_pixels(bytes(blob or b""))
                h, w = px.shape[:2]
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                rs.append(int(sums[0]))
                gs.append(int(sums[1]))
                bs.append(int(sums[2]))
            yield pd.DataFrame(
                {
                    id_field.name: ids, "width": ws, "height": hs,
                    "r_sum": rs, "g_sum": gs, "b_sum": bs,
                }
            )

    schema = StructType(
        [StructField(id_field.name, id_field.dataType)]
        + IMAGE_PIXEL_STATS_SCHEMA.fields[1:]
    )
    return df.mapInPandas(_gen, schema)


AUDIO_SAMPLE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("sample_sum", LongType()),
        StructField("sample_min", IntegerType()),
        StructField("sample_max", IntegerType()),
    ]
)


def audio_sample_stats(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-clip statistics from REAL decoded PCM samples
    (``decode_wav_samples``); exact integer sums/extrema for oracle
    hashing. Same Arrow-batched contract as ``image_pixel_stats``,
    including the derived (not hard-coded) id field name/type."""
    id_field = df.schema[id_col]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, ns, sums, mins, maxs = [], [], [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                samples, rate = decode_wav_samples(bytes(blob or b""))
                ids.append(mid)
                rates.append(rate)
                ns.append(int(samples.shape[0]))
                sums.append(int(samples.sum(dtype=np.int64)))
                mins.append(int(samples.min()) if samples.size else 0)
                maxs.append(int(samples.max()) if samples.size else 0)
            yield pd.DataFrame(
                {
                    id_field.name: ids, "sample_rate": rates,
                    "n_frames": ns, "sample_sum": sums,
                    "sample_min": mins, "sample_max": maxs,
                }
            )

    schema = StructType(
        [StructField(id_field.name, id_field.dataType)]
        + AUDIO_SAMPLE_STATS_SCHEMA.fields[1:]
    )
    return df.mapInPandas(_gen, schema)


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


# --------------------------------------------------------------------------
# resize — real nearest-neighbor over decoded pixels (no codec libs needed)
# --------------------------------------------------------------------------


def resize_pixels(px: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resize with the FLOOR index mapping
    ``src = (dst * src_dim) // dst_dim`` — deterministic integer
    arithmetic, so a SQL oracle can state the resized image's pixel values
    exactly (fractional-center mappings round through floats and cannot).
    One numpy fancy-index; no interpolation arithmetic touches the pixel
    values."""
    h, w = px.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return px[rows[:, None], cols[None, :]]


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Batch image resize — decode (real stdlib BMP path, PIL routing for
    compressed formats when present) → nearest-neighbor resize →
    re-encode as 24-bpp BMP. The Spark shape of a training-data image
    normalization stage: mapInPandas streams Arrow batches, memory ∝
    batch size × image size, output is again an opaque binary column so
    downstream feature/stat operators compose unchanged. The id column
    keeps its input name AND type (string media ids pass through — the
    output schema is derived from ``df.schema[id_col]``, not hard-coded
    long)."""
    id_field = df.schema[id_col]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blobs = [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_pixels(bytes(blob or b""))
                resized = resize_pixels(px, out_h, out_w)
                ids.append(mid)
                hs.append(out_h)
                ws.append(out_w)
                blobs.append(encode_bmp(resized.astype(np.uint8)))
            yield pd.DataFrame(
                {
                    id_field.name: ids, "width": ws, "height": hs,
                    "content": blobs,
                }
            )

    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("content", BinaryType()),
        ]
    )
    return df.mapInPandas(_gen, schema)


def resample_audio(
    df: DataFrame,
    out_rate: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Batch audio resample — decode PCM WAV, nearest-neighbor sample
    mapping ``src = (dst * n_src) // n_dst`` (the zero-order-hold twin of
    :func:`resize_pixels`: deterministic integer index arithmetic, no
    filter taps touch the sample values, so a SQL oracle can state the
    output exactly), re-encode at ``out_rate``. Output frame count is
    ``round(n_src · out_rate / src_rate)`` via integer half-up. The Spark
    shape of a training-data audio normalization stage; output is again a
    WAV binary column so downstream stat/feature operators compose. The
    id column keeps its input name AND type (derived from
    ``df.schema[id_col]``, not hard-coded long)."""
    id_field = df.schema[id_col]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, frames, blobs = [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                samples, rate = decode_wav_samples(bytes(blob or b""))
                n_src = samples.shape[0]
                n_dst = (2 * n_src * out_rate + rate) // (2 * rate)
                idx = (np.arange(n_dst) * n_src) // max(n_dst, 1)
                out = samples[idx] if n_dst > 0 else samples[:0]
                ids.append(mid)
                rates.append(out_rate)
                frames.append(int(n_dst))
                blobs.append(encode_wav(out.astype(np.int16), out_rate))
            yield pd.DataFrame(
                {
                    id_field.name: ids, "sample_rate": rates,
                    "n_frames": frames, "content": blobs,
                }
            )

    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("sample_rate", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    return df.mapInPandas(_gen, schema)


def ahash_bits(px: "np.ndarray", grid: int = 8) -> str:
    """Average-hash (aHash) perceptual fingerprint of a decoded pixel
    array, as a row-major '0'/'1' string of ``grid²`` bits: floor-map
    nearest-neighbor downsample to grid×grid (:func:`resize_pixels` —
    the rule a SQL oracle can state exactly), integer grayscale
    ``(r+g+b) DIV 3``, floor mean over the grid, bit = gray > mean.
    Every step is integer arithmetic, so the hash is engine/platform
    reproducible — unlike DCT-based pHash, whose float transform can't
    be cross-checked. The string form keeps the sign-bit/bigint issues
    out entirely (64 chars vs the 1<<63 DuckDB overflow, see
    operators/bloom.py)."""
    small = resize_pixels(px, grid, grid)
    gray = small.astype(np.int64).sum(axis=-1) // 3
    mean = int(gray.sum()) // (grid * grid)
    return "".join(
        "1" if int(v) > mean else "0" for v in gray.reshape(-1)
    )


def image_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    grid: int = 8,
) -> DataFrame:
    """Per-image aHash over an opaque binary column — the IMAGE
    near-duplicate key of the dedup suite (web-scale image corpus dedup
    groups by perceptual hash exactly like text dedup groups by
    MinHash band). mapInPandas streams Arrow batches; output is
    ``(id, ahash)`` with the id column's name and type passed through.
    Group on ``ahash`` for exact-tier dedup, or compare bit strings
    within hash-prefix blocks for a Hamming tier (the SimHash
    pigeonhole technique in operators/dedup.py applies verbatim)."""
    id_field = df.schema[id_col]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = decode_pixels(bytes(blob or b""))
                ids.append(mid)
                hashes.append(ahash_bits(px, grid))
            yield pd.DataFrame({id_field.name: ids, "ahash": hashes})

    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("ahash", StringType()),
        ]
    )
    return df.mapInPandas(_gen, schema)


def audio_energy_bits(samples: "np.ndarray", windows: int = 64) -> str:
    """Energy-profile fingerprint of decoded PCM samples — the AUDIO
    twin of :func:`ahash_bits`: frames collapse to mono (integer mean
    across channels), the floor-map rule assigns each of ``windows``
    output slots a source frame index (same
    ``src = (dst · n) // windows`` arithmetic as :func:`resize_pixels`,
    so a SQL oracle can state every sampled value), the per-slot metric
    is |sample|, and bit = metric > floor-mean over the slots. Pure
    integer arithmetic, '0'/'1' string out; group equal strings for the
    exact tier, pigeonhole blocks for a Hamming tier."""
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
    n = mono.shape[0]
    if n == 0:  # zero-frame clip: nothing exceeds the mean
        return "0" * windows
    idx = (np.arange(windows) * n) // windows
    vals = np.abs(mono[idx])
    mean = int(vals.sum()) // windows
    return "".join("1" if int(v) > mean else "0" for v in vals)


def audio_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    windows: int = 64,
) -> DataFrame:
    """Per-clip energy fingerprint over an opaque WAV binary column —
    decode (RIFF walk, real PCM samples), fingerprint, emit
    ``(id, ahash)`` with the id column's name/type passed through;
    mapInPandas Arrow batches, clips never shuffle — only 64-char
    keys do."""
    id_field = df.schema[id_col]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                samples, _rate = decode_wav_samples(bytes(blob or b""))
                ids.append(mid)
                hashes.append(audio_energy_bits(samples, windows))
            yield pd.DataFrame({id_field.name: ids, "ahash": hashes})

    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("ahash", StringType()),
        ]
    )
    return df.mapInPandas(_gen, schema)
