"""Multimodal tier: real header parsing (PNG/GIF/JPEG/BMP/WAV built in-test
from specs), REAL BMP/WAV pixel-sample codecs (encode↔decode round-trip),
decode determinism, mapInPandas batch plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectordb_etl_spark.multimodal import (
    audio_feature_vector,
    audio_features,
    audio_sample_stats,
    decode_bmp_pixels,
    decode_pixels,
    decode_wav_samples,
    encode_bmp,
    encode_wav,
    fake_decode_features,
    image_feature_vector,
    image_features,
    image_pixel_stats,
    media_table,
    parse_audio_meta,
    parse_image_meta,
    pixel_features,
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


# -- REAL BMP/WAV codecs ------------------------------------------------------


def test_bmp_encode_decode_roundtrip():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (7, 2), (16, 16)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_bmp(px)
        meta = parse_image_meta(data)
        assert (meta["format"], meta["width"], meta["height"]) == ("bmp", w, h)
        assert (decode_bmp_pixels(data) == px).all()


def test_bmp_top_down_rows():
    rng = np.random.RandomState(8)
    px = rng.randint(0, 256, (4, 3, 3), dtype=np.uint8)
    d = bytearray(encode_bmp(px))
    d[22:26] = struct.pack("<i", -4)  # negative height = top-down storage
    assert (decode_bmp_pixels(bytes(d)) == px[::-1]).all()


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp_pixels(b"PNG junk")
    d = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    d[28:30] = struct.pack("<H", 8)  # 8-bpp paletted
    with pytest.raises(ValueError, match="24-bpp"):
        decode_bmp_pixels(bytes(d))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_pixels(bytes(encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))[:60]))


def test_wav_encode_decode_roundtrip():
    rng = np.random.RandomState(9)
    for ch in (1, 2):
        s = rng.randint(-32768, 32768, (37, ch)).astype(np.int16)
        back, rate = decode_wav_samples(encode_wav(s, 22050))
        assert rate == 22050 and (back == s).all()


def test_wav_chunk_walk_and_8bit():
    # a LIST chunk between fmt and data must be skipped, not break parsing
    s = np.arange(10, dtype=np.int16).reshape(-1, 1)
    data = encode_wav(s, 44100)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    data2 = data[:36] + lst + data[36:]
    data2 = data2[:4] + struct.pack("<I", len(data2) - 8) + data2[8:]
    back, _ = decode_wav_samples(data2)
    assert (back.ravel() == np.arange(10)).all()
    # 8-bit PCM widens to centered int16
    hdr = (
        b"RIFF" + struct.pack("<I", 40) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 4) + bytes([0, 128, 255, 64])
    )
    back, _ = decode_wav_samples(hdr)
    assert list(back.ravel()) == [(-128) << 8, 0, 127 << 8, (-64) << 8]


def test_decode_pixels_routes_bmp_without_pil():
    px = np.full((2, 2, 3), 9, dtype=np.uint8)
    assert (decode_pixels(encode_bmp(px)) == px).all()


def test_real_feature_vectors():
    rng = np.random.RandomState(10)
    px = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    fv = image_feature_vector(encode_bmp(px))
    assert len(fv) == 16
    assert sum(x * x for x in fv) == pytest.approx(1.0, abs=1e-6)
    # features derive from REAL pixels: same pixels → same features,
    # different pixels → different features, and they equal pixel_features
    assert fv == pixel_features(px)
    px2 = px.copy(); px2[0, 0] = [0, 0, 0]
    assert image_feature_vector(encode_bmp(px2)) != fv
    # audio: constant signal → zero std, rms == |mean|
    fa = audio_feature_vector(encode_wav(np.full((64, 1), 1000, np.int16), 8000))
    assert len(fa) == 16 and fa[1] == pytest.approx(0.0, abs=1e-9)
    # undecodable codec falls back to the deterministic fake
    assert image_feature_vector(b"\xff\xd8 junk") == fake_decode_features(b"\xff\xd8 junk")


def test_pixel_audio_stats_operators(spark):
    rng = np.random.RandomState(11)
    px1 = rng.randint(0, 256, (3, 4, 3), dtype=np.uint8)
    px2 = rng.randint(0, 256, (2, 2, 3), dtype=np.uint8)
    s1 = rng.randint(-32768, 32768, (20, 2)).astype(np.int16)
    df_img = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px1))), (2, bytearray(encode_bmp(px2)))],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r for r in image_pixel_stats(df_img).collect()}
    assert got[1]["width"] == 4 and got[1]["height"] == 3
    exp = px1.reshape(-1, 3).sum(axis=0)
    assert (got[1]["r_sum"], got[1]["g_sum"], got[1]["b_sum"]) == tuple(int(x) for x in exp)
    df_aud = spark.createDataFrame(
        [(7, bytearray(encode_wav(s1, 16000)))], "media_id long, content binary"
    )
    a = audio_sample_stats(df_aud).collect()[0]
    assert a["sample_rate"] == 16000 and a["n_frames"] == 20
    assert a["sample_sum"] == int(s1.sum())
    assert a["sample_min"] == int(s1.min()) and a["sample_max"] == int(s1.max())


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


def test_resize_pixels_floor_mapping_and_roundtrip(spark):
    """resize_pixels uses the floor index map (src = dst*H//out); the full
    decode->resize->encode->decode chain preserves exact pixel values
    (nearest neighbor copies bytes, never interpolates)."""
    import numpy as np

    from vectordb_etl_spark.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        resize_images,
        resize_pixels,
    )

    px = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    small = resize_pixels(px, 2, 3)
    assert small.shape == (2, 3, 3)
    for r2 in range(2):
        for c2 in range(3):
            assert (small[r2, c2] == px[(r2 * 5) // 2, (c2 * 7) // 3]).all()
    # upscale duplicates rows/cols, still exact copies
    big = resize_pixels(px, 10, 14)
    assert (big[::2, ::2] == px).all()

    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px)))], "media_id long, content binary"
    )
    out = resize_images(df, out_h=2, out_w=3).collect()[0]
    assert (out["width"], out["height"]) == (3, 2)
    assert (decode_bmp_pixels(bytes(out["content"])) == small).all()


def test_resample_audio_nearest_and_count(spark):
    """Zero-order-hold resample: output count is half-up(n*out/in); sample
    j copies source (j*n)//n_dst exactly (no filter arithmetic)."""
    import numpy as np

    from vectordb_etl_spark.multimodal import (
        decode_wav_samples,
        encode_wav,
        resample_audio,
    )

    samples = np.arange(-10, 10, dtype=np.int16).reshape(-1, 1)  # n=20
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples, 8000)))],
        "media_id long, content binary",
    )
    out = resample_audio(df, out_rate=6000, id_col="media_id").collect()[0]
    n_dst = (2 * 20 * 6000 + 8000) // (2 * 8000)  # 15
    assert out["n_frames"] == n_dst and out["sample_rate"] == 6000
    dec, rate = decode_wav_samples(bytes(out["content"]))
    assert rate == 6000 and dec.shape[0] == n_dst
    expect = samples[(np.arange(n_dst) * 20) // n_dst]
    assert (dec == expect).all()


def test_resize_and_resample_respect_string_id_column(spark):
    """The output id field takes its name AND type from df.schema[id_col]
    — string media ids round-trip instead of failing Arrow conversion
    against a hard-coded LongType."""
    import numpy as np

    from vectordb_etl_spark.multimodal import (
        encode_bmp,
        encode_wav,
        resample_audio,
        resize_images,
    )

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("img-a", bytearray(encode_bmp(px)))], "uri string, content binary"
    )
    out = resize_images(df, out_h=2, out_w=2, id_col="uri")
    assert out.schema["uri"].dataType.simpleString() == "string"
    assert out.collect()[0]["uri"] == "img-a"

    samples = np.arange(8, dtype=np.int16).reshape(-1, 1)
    dfa = spark.createDataFrame(
        [("wav-b", bytearray(encode_wav(samples, 8000)))],
        "uri string, content binary",
    )
    outa = resample_audio(dfa, out_rate=4000, id_col="uri")
    assert outa.schema["uri"].dataType.simpleString() == "string"
    assert outa.collect()[0]["uri"] == "wav-b"


def test_ahash_identical_images_same_hash_different_differ(spark):
    import numpy as np

    from vectordb_etl_spark.multimodal import ahash_bits, encode_bmp, image_ahash

    def img(seed, w=12, h=10):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        return encode_bmp(
            np.stack(
                [(seed + 5 * xx) % 256, (seed + yy) % 256, (xx * yy) % 256],
                axis=-1,
            ).astype(np.uint8)
        )

    rows = [(1, img(0)), (2, img(0)), (3, img(140)), (4, img(0, w=30, h=4))]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    got = {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] == got[2]                    # byte-identical -> equal
    assert got[1] != got[3]                    # different gradient -> differs
    assert all(len(v) == 64 for v in got.values())
    # pure-python parity with the array-level function
    from vectordb_etl_spark.multimodal import decode_bmp_pixels

    assert got[1] == ahash_bits(decode_bmp_pixels(img(0)))


def test_ahash_constant_image_is_all_zeros(spark):
    import numpy as np

    from vectordb_etl_spark.multimodal import ahash_bits

    # constant gray: nothing exceeds the mean -> all '0' (the > rule)
    px = np.full((9, 9, 3), 77, dtype=np.uint8)
    assert ahash_bits(px) == "0" * 64


def test_audio_energy_bits_bursts_and_parity(spark):
    import numpy as np

    from vectordb_etl_spark.multimodal import (
        audio_ahash,
        audio_energy_bits,
        decode_wav_samples,
        encode_wav,
    )

    # loud burst in the middle third -> those slots read '1'
    quiet, loud = np.full(40, 10), np.full(20, 20000)
    samples = np.concatenate([quiet, loud, quiet]).astype(np.int16)
    bits = audio_energy_bits(samples.reshape(-1, 1), windows=10)
    assert bits == "0000110000"
    # UDF path parity with the array-level function, stereo collapse
    stereo = np.stack([samples, samples], axis=1).astype(np.int16)
    blob = encode_wav(stereo, 8000)
    df = spark.createDataFrame([(1, blob)], "media_id bigint, content binary")
    got = audio_ahash(df, windows=10).first()["ahash"]
    dec, _ = decode_wav_samples(blob)
    assert got == audio_energy_bits(dec, windows=10) == bits
