"""PNG: pure-stdlib compressed-image codec (zlib + numpy) and its
integration into decode_media / resize_media / the decode_features seam.

Proof obligations:
- encode/decode roundtrip across every channel count x every scanline
  filter type (the decoder's five defilter paths are all exercised);
- palette (PLTE) expansion;
- honest failure on truncation and on recognized-but-unsupported
  variants (16-bit, interlaced);
- Spark-side: decode_media recovers geometry + pixel digest from the
  compressed bytes; resize_media's PNG path is pixel-exact against
  numpy striding and re-emits standards-decodable bytes.
"""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from sonnerie_spark.operators import multimodal, pngcodec


def _rng():
    return np.random.default_rng(20260814)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters_all_channels(channels, filter_type):
    a = _rng().integers(0, 256, (17, 11, channels), dtype=np.uint8)
    b = pngcodec.encode_png(a, filter_type=filter_type)
    w, h, ch, px = pngcodec.decode_png(b)
    assert (w, h, ch) == (11, 17, channels)
    assert np.array_equal(px, a)


def test_gray_2d_input_and_header_parse():
    a = _rng().integers(0, 256, (5, 7), dtype=np.uint8)
    b = pngcodec.encode_png(a, filter_type=1)
    hdr = pngcodec.parse_ihdr(b)
    assert (hdr["width"], hdr["height"], hdr["color_type"]) == (7, 5, 0)
    assert pngcodec.decode_png(b)[3].shape == (5, 7, 1)


def _chunk(typ, data):
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def test_palette_expansion():
    pal = bytes(range(30))  # 10 RGB entries
    idx = _rng().integers(0, 10, (6, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    png = (
        pngcodec._SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 6, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, ch, px = pngcodec.decode_png(png)
    assert (w, h, ch) == (4, 6, 3)
    assert np.array_equal(px, np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx])
    # out-of-range palette index -> honest failure
    bad = (
        pngcodec._SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 6, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal[:9])  # only 3 entries
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert pngcodec.decode_png(bad) is None


def test_truncation_and_unsupported_variants():
    full = pngcodec.encode_png(
        _rng().integers(0, 256, (8, 8, 3), dtype=np.uint8), filter_type=4
    )
    assert pngcodec.decode_png(full[:-10]) is None  # truncated
    assert pngcodec.parse_ihdr(full[:-10]) is not None  # header still reads
    # 16-bit and interlaced parse as PNG but refuse to decode
    for depth, inter in ((16, 0), (8, 1)):
        hdr = struct.pack(">IIBBBBB", 4, 4, depth, 2, 0, 0, inter)
        png = (
            pngcodec._SIG + _chunk(b"IHDR", hdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + _chunk(b"IEND", b"")
        )
        assert pngcodec.parse_ihdr(png) is not None
        assert pngcodec.decode_png(png) is None
    assert pngcodec.decode_png(b"\x89PNG but not really") is None
    # corrupt DEFLATE stream
    garbage = (
        pngcodec._SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", b"\x01\x02\x03\x04")
        + _chunk(b"IEND", b"")
    )
    assert pngcodec.decode_png(garbage) is None


def _media_df(spark, blobs):
    return spark.createDataFrame(
        [(i, "image", bytearray(b), None) for i, b in enumerate(blobs)],
        multimodal.MEDIA_SCHEMA,
    )


def test_decode_media_png(spark):
    rng = _rng()
    rgb = rng.integers(0, 256, (20, 15, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    full = pngcodec.encode_png(rgb, filter_type=4)
    got = {
        r["media_id"]: r.asDict()
        for r in multimodal.decode_media(
            _media_df(
                spark,
                [full, pngcodec.encode_png(gray, filter_type=3), full[:-12]],
            )
        ).collect()
    }
    assert (
        got[0]["codec"], got[0]["width"], got[0]["height"],
        got[0]["channels"], got[0]["valid"],
    ) == ("png", 15, 20, 3, True)
    # the digest is of the DECODED matrix: decompression really happened
    assert got[0]["pixel_md5"] == hashlib.md5(rgb.tobytes()).hexdigest()
    assert (got[1]["codec"], got[1]["channels"], got[1]["valid"]) == (
        "png", 1, True,
    )
    assert got[1]["pixel_md5"] == hashlib.md5(gray.tobytes()).hexdigest()
    # truncated: geometry from IHDR, but valid=False, no digest
    assert (got[2]["codec"], got[2]["width"], got[2]["valid"]) == (
        "png", 15, False,
    )
    assert got[2]["pixel_md5"] is None


def test_decode_media_netpbm_pixel_md5(spark):
    payload = (b"\xab\xcd\xef" * (4 * 3))[: 4 * 3 * 3]
    ppm = b"P6\n4 3\n255\n" + payload
    (row,) = multimodal.decode_media(_media_df(spark, [ppm])).collect()
    assert row["pixel_md5"] == hashlib.md5(payload).hexdigest()
    assert row["channels"] == 3


def test_resize_media_png_pixel_exact(spark):
    rng = _rng()
    rgb = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    df = _media_df(spark, [pngcodec.encode_png(rgb, filter_type=1)])
    (row,) = multimodal.resize_media(df, factor=2).collect()
    assert (row["codec"], row["width"], row["height"]) == ("png", 7, 11)
    w, h, ch, px = pngcodec.decode_png(bytes(row["content"]))
    assert np.array_equal(px, rgb[::2, ::2, :])


def test_decode_features_png_decoder(spark):
    rng = _rng()
    rgb = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    df = _media_df(spark, [pngcodec.encode_png(rgb), b"not an image"])
    rows = {
        r["media_id"]: r.asDict()
        for r in multimodal.decode_features(
            df, decoder=multimodal.png_feature_decoder()
        ).collect()
    }
    flat = rgb.reshape(-1, 3).astype("float64")
    expect = list(flat.mean(axis=0)) + list(flat.std(axis=0))
    assert (rows[0]["width"], rows[0]["height"]) == (6, 10)
    assert rows[0]["feature"][:6] == pytest.approx(expect, abs=1e-4)
    assert rows[0]["feature"][6:] == [0.0, 0.0]
    # undecodable bytes: zeros, not fake dimensions
    assert (rows[1]["width"], rows[1]["height"]) == (0, 0)
    assert rows[1]["feature"] == [0.0] * 8
