"""GIF: pure-Python LZW codec and its decode_media / resize_media
integration.

Proof obligations:
- the canonical public 1x1 GIF fixture decodes (external-bytes
  conformance, not just self-consistency);
- encode/decode roundtrip across LZW width growth (256 colors,
  64x64 = 4096 pixels forces 12-bit codes) and dictionary resets,
  sequential and interlaced;
- honest failure on truncation;
- Spark-side geometry + pixel digest recovery and pixel-exact resize.
"""

import hashlib

import numpy as np
import pytest

from sonnerie_spark.operators import gifcodec, multimodal

#: the ubiquitous 1x1 black-pixel GIF (public canonical bytes)
ONE_PX = bytes.fromhex(
    "47494638396101000100800000000000ffffff21f9040100000000"
    "2c00000000010001000002024401003b"
)


def test_canonical_external_fixture():
    w, h, ch, px = gifcodec.decode_gif(ONE_PX)
    assert (w, h, ch) == (1, 1, 3)
    assert px.tolist() == [[[0, 0, 0]]]
    scr = gifcodec.parse_screen(ONE_PX)
    assert (scr["width"], scr["height"], scr["version"]) == (1, 1, "GIF89a")


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize(
    "shape,ncolors,mcs",
    [((3, 4), 8, 3), ((64, 64), 256, 8), ((9, 1000), 256, 8), ((200, 30), 4, 2)],
)
def test_roundtrip(shape, ncolors, mcs, interlace):
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, shape, dtype=np.uint8)
    b = gifcodec.encode_gif(idx, pal, interlace=interlace, min_code_size=mcs)
    w, h, ch, px = gifcodec.decode_gif(b)
    assert (w, h, ch) == (shape[1], shape[0], 3)
    assert np.array_equal(px, pal[idx])


def test_dict_reset_and_low_entropy():
    idx = np.tile(np.arange(256, dtype=np.uint8), (40, 16))  # 40x4096 px
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    b = gifcodec.encode_gif(idx, pal)
    assert np.array_equal(gifcodec.decode_gif(b)[3], pal[idx])
    assert len(b) < idx.size  # LZW actually compressed the repetition


def test_truncation_honest():
    pal = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8)
    idx = np.random.default_rng(0).integers(0, 16, (8, 64), dtype=np.uint8)
    full = gifcodec.encode_gif(idx, pal, min_code_size=4)
    for cut in (10, len(full) // 2, len(full) - 2):
        assert gifcodec.decode_gif(full[:cut]) is None
    assert gifcodec.parse_screen(full[:13]) is not None
    assert gifcodec.decode_gif(b"GIF8 nope") is None
    assert gifcodec.parse_screen(b"\x89PNG\r\n\x1a\n") is None


def _media_df(spark, blobs):
    return spark.createDataFrame(
        [(i, "image", bytearray(b), None) for i, b in enumerate(blobs)],
        multimodal.MEDIA_SCHEMA,
    )


def test_decode_media_gif(spark):
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, (12, 7), dtype=np.uint8)
    full = gifcodec.encode_gif(idx, pal, interlace=True, min_code_size=5)
    got = {
        r["media_id"]: r.asDict()
        for r in multimodal.decode_media(
            _media_df(spark, [full, full[: len(full) - 4]])
        ).collect()
    }
    assert (
        got[0]["codec"], got[0]["width"], got[0]["height"],
        got[0]["channels"], got[0]["valid"],
    ) == ("gif", 7, 12, 3, True)
    assert got[0]["pixel_md5"] == hashlib.md5(pal[idx].tobytes()).hexdigest()
    assert (got[1]["codec"], got[1]["width"], got[1]["valid"]) == (
        "gif", 7, False,
    )
    assert got[1]["pixel_md5"] is None


def test_resize_media_gif_pixel_exact(spark):
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, (15, 9), dtype=np.uint8)
    df = _media_df(spark, [gifcodec.encode_gif(idx, pal)])
    (row,) = multimodal.resize_media(df, factor=2).collect()
    assert (row["codec"], row["width"], row["height"]) == ("gif", 5, 8)
    w, h, ch, px = gifcodec.decode_gif(bytes(row["content"]))
    assert np.array_equal(px, pal[idx][::2, ::2, :])
