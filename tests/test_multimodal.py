"""Multimodal tier: real header parsing (PNG/GIF/JPEG/BMP/WAV built in-test
from specs), stubbed decode determinism, mapInPandas batch plumbing."""

from __future__ import annotations

import struct

import pytest

from vectordb_etl_spark.multimodal import (
    audio_features,
    fake_decode_features,
    image_features,
    media_table,
    parse_audio_meta,
    parse_image_meta,
    sample_frames,
)

# -- synthetic files from format specs (headers real, bodies arbitrary) ------


def make_png(w=320, h=240) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        + b"\x00" * 32
    )


def make_gif(w=64, h=48) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 16


def make_jpeg(w=800, h=600) -> bytes:
    # SOI + APP0 segment + SOF0 with dims
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 8


def make_wav(seconds=2, rate=16000, channels=1, bits=16) -> bytes:
    n_data = seconds * rate * channels * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + n_data) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                 rate * channels * bits // 8,
                                 channels * bits // 8, bits)
    hdr += b"data" + struct.pack("<I", n_data)
    return hdr + b"\x01" * n_data


def test_parse_image_headers():
    assert parse_image_meta(make_png(320, 240)) == {"format": "png", "width": 320, "height": 240}
    assert parse_image_meta(make_gif(64, 48)) == {"format": "gif", "width": 64, "height": 48}
    j = parse_image_meta(make_jpeg(800, 600))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 800, 600)
    assert parse_image_meta(b"")["format"] is None
    assert parse_image_meta(b"garbage")["format"] is None


def test_parse_audio_header():
    m = parse_audio_meta(make_wav(2, 16000, 1, 16))
    assert m["format"] == "wav" and m["sample_rate"] == 16000
    assert m["channels"] == 1 and m["bits_per_sample"] == 16
    assert m["duration_ms"] == 2000


def test_fake_decode_deterministic_and_normalized():
    a, b = fake_decode_features(b"xyz"), fake_decode_features(b"xyz")
    assert a == b and len(a) == 16
    assert sum(x * x for x in a) == pytest.approx(1.0, abs=1e-5)
    assert fake_decode_features(b"other") != a


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, make_png(320, 240)),
        (2, make_jpeg(800, 600)),
        (3, make_wav()),
        (4, b"\x00" * 200_000),  # opaque blob (video stand-in)
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_image_features_schema_and_values(media_df):
    rows = {r["media_id"]: r for r in image_features(media_df).collect()}
    assert rows[1]["format"] == "png" and rows[1]["width"] == 320
    assert rows[2]["format"] == "jpeg" and rows[2]["height"] == 600
    assert rows[3]["format"] is None  # wav is not an image
    assert all(len(r["features"]) == 16 for r in rows.values())
    assert rows[1]["n_bytes"] == len(make_png(320, 240))


def test_audio_features(media_df):
    rows = {r["media_id"]: r for r in audio_features(media_df).collect()}
    assert rows[3]["format"] == "wav" and rows[3]["sample_rate"] == 16000
    assert rows[1]["format"] is None


def test_sample_frames_fanout(media_df):
    frames = sample_frames(media_df, every_n_bytes=1 << 16, max_frames=4).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f["media_id"], []).append(f)
    # 200_000 bytes / 65536 → 4 frames (capped); small files → 1 frame
    assert len(by_id[4]) == 4
    assert len(by_id[1]) == 1
    f0 = sorted(by_id[4], key=lambda r: r["frame_index"])[0]
    assert f0["frame_offset_bytes"] == 0 and len(bytes(f0["frame"])) == 1 << 16


def test_media_table_kind_sniffing(media_df):
    rows = {r["media_id"]: r for r in media_table(media_df).collect()}
    assert rows[1]["kind"] == "image" and rows[3]["kind"] == "audio"
    assert rows[4]["kind"] == "binary"
    assert rows[4]["meta"]["n_bytes"] == 200_000
