"""Baseline JPEG: pure-numpy DCT/Huffman codec and its decode_media /
resize_media integration.

Proof obligations:
- uniform even-valued 8x8 blocks are encoded EXACTLY at quality 50
  (the property the oracle gate exploits to value-hash a lossy codec);
- encode->decode reaches high PSNR on smooth content, grayscale and
  4:4:4 color, including non-multiple-of-8 geometry (edge padding);
- width/height/channel recovery from SOF0; honest invalidity on
  truncation and on progressive (SOF2) streams;
- Spark-side decode_media digest recovery and resize roundtrip.

(Dev-time conformance was additionally checked against external
libjpeg-produced files — 4:2:0 subsampling, standard Annex K Huffman
tables, restart-marker streams — which are not vendored here.)
"""

import hashlib
import struct

import numpy as np
import pytest

from sonnerie_spark.operators import jpegcodec, multimodal


def test_uniform_even_blocks_lossless():
    rng = np.random.default_rng(2)
    vals = (rng.integers(0, 128, (4, 5)) * 2).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    w, h, ch, px = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(img, quality=50))
    assert (w, h, ch) == (40, 32, 1)
    assert np.array_equal(px[:, :, 0], img)


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_gray_gradient_high_psnr():
    x = np.linspace(0, 255, 64)
    img = ((x[None, :] + x[:, None]) / 2).astype(np.uint8)
    px = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(img, quality=90))[3]
    assert _psnr(px[:, :, 0], img) > 40


def test_color_and_odd_geometry():
    rgb = np.zeros((21, 13, 3), np.uint8)  # forces edge padding
    rgb[..., 0] = np.linspace(10, 240, 13)[None, :]
    rgb[..., 1] = np.linspace(240, 10, 21)[:, None]
    rgb[..., 2] = 99
    w, h, ch, px = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(rgb, quality=95))
    assert (w, h, ch) == (13, 21, 3)
    assert _psnr(px, rgb) > 30


def test_quality_monotone_size():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    sizes = [len(jpegcodec.encode_jpeg(img, quality=qq)) for qq in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_truncation_and_progressive_honest():
    img = np.full((16, 16), 100, np.uint8)
    full = jpegcodec.encode_jpeg(img)
    assert jpegcodec.decode_jpeg(full[: len(full) // 2]) is None
    assert jpegcodec.decode_jpeg(b"\xff\xd8\xff\xee junk") is None
    assert jpegcodec.parse_sof(b"not a jpeg") is None
    # flip SOF0 -> SOF2 (progressive): recognized, refused honestly
    i = full.index(b"\xff\xc0")
    prog = full[:i] + b"\xff\xc2" + full[i + 2 :]
    sof = jpegcodec.parse_sof(prog)
    assert sof is not None and sof["progressive"] and not sof["baseline"]
    assert jpegcodec.decode_jpeg(prog) is None


@pytest.mark.parametrize("interval", [1, 2, 3])
def test_restart_marker_stream(interval):
    """DRI + RSTn streams decode with the DC predictor reset at each
    restart interval — and stay exact on the lossless construction, so
    a decoder that ignores restarts (or fails to re-align the
    bitstream) produces wrong pixels, not a crash."""
    img = np.repeat(
        np.repeat(np.array([[60, 62, 64, 66], [68, 70, 72, 74]], np.uint8), 8, 0),
        8, 1,
    )
    b = jpegcodec.encode_jpeg(img, quality=50, restart_interval=interval)
    assert b.count(b"\xff\xdd") == 1  # DRI present
    w, h, ch, px = jpegcodec.decode_jpeg(b)
    assert (w, h) == (32, 16)
    assert np.array_equal(px[:, :, 0], img)


def _media_df(spark, blobs):
    return spark.createDataFrame(
        [(i, "image", bytearray(b), None) for i, b in enumerate(blobs)],
        multimodal.MEDIA_SCHEMA,
    )


def test_decode_media_jpeg(spark):
    vals = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 2 + 40).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    full = jpegcodec.encode_jpeg(img, quality=50)
    i = full.index(b"\xff\xc0")
    prog = full[:i] + b"\xff\xc2" + full[i + 2 :]
    got = {
        r["media_id"]: r.asDict()
        for r in multimodal.decode_media(
            _media_df(spark, [full, full[: len(full) - 6], prog])
        ).collect()
    }
    assert (
        got[0]["codec"], got[0]["width"], got[0]["height"],
        got[0]["channels"], got[0]["valid"],
    ) == ("jpeg", 32, 24, 1, True)
    assert got[0]["pixel_md5"] == hashlib.md5(img.tobytes()).hexdigest()
    assert (got[1]["codec"], got[1]["valid"]) == ("jpeg", False)
    # progressive: geometry known from SOF2, honestly not decoded
    assert (got[2]["codec"], got[2]["width"], got[2]["valid"]) == (
        "jpeg", 32, False,
    )


def test_resize_media_jpeg(spark):
    vals = (np.random.default_rng(8).integers(0, 128, (4, 4)) * 2).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)  # 32x32
    df = _media_df(spark, [jpegcodec.encode_jpeg(img, quality=50)])
    (row,) = multimodal.resize_media(df, factor=2).collect()
    assert (row["codec"], row["width"], row["height"]) == ("jpeg", 16, 16)
    w, h, ch, px = jpegcodec.decode_jpeg(bytes(row["content"]))
    assert (w, h) == (16, 16)
    # lossy hop: close, not exact
    assert _psnr(px[:, :, 0], img[::2, ::2]) > 30
