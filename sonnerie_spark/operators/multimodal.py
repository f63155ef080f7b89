"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Decoding comes in two tiers:

- ``decode_media``: REAL decoding with no codec library — netpbm images
  (PPM/PGM: width/height), RIFF WAV audio (channels/sample rate/frame
  count/duration), and compressed PNG + GIF + baseline JPEG images
  (full inflate / defilter / LZW / Huffman+IDCT / palette expansion
  via the pure-Python ``pngcodec`` / ``gifcodec`` / ``jpegcodec``
  modules; the ``pixel_md5`` column digests the actual decoded pixels,
  so the gate proves the decompression is real, not a header skim).
- ``decode_features``: the pluggable feature-extraction seam.
  ``real_feature_decoder()`` fills it for every format this package
  really decodes (netpbm/PNG/GIF/JPEG/AVI-MJPEG pixel stats, WAV
  sample stats); the clearly-marked stub default remains only for
  content whose payload decode genuinely needs an external library
  (MP3/AAC audio samples, inter-frame video) — swap the ``decoder``
  callable without touching the plan.

Pattern at 100 TB: media bytes travel as a ``binary`` column next to
typed metadata; decode/feature passes run as ``mapInPandas`` so each
Arrow batch amortizes Python crossing; partition sizing is driven by
``bytes_per_row`` not row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from . import avicodec, gifcodec, jpegcodec, mp3codec, pngcodec

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_column(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped frame from any source by treating a column's
    bytes as opaque content (deterministic stand-in for real media)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.create_map(F.lit("codec"), F.lit("stub")).alias("meta"),
    )


def decode_features(df: DataFrame, *, decoder=None) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow-batched).

    The hot loop is per-batch, not per-row. ``decoder`` is the seam for
    a real media library: ``bytes -> (width, height, feature_list)``.
    The default is a clearly-marked STUB producing deterministic fake
    dimensions/features (image/audio libs are not in this environment);
    it is defined inside this function so cloudpickle ships it by value
    and workers need no package install.
    """
    import hashlib

    if decoder is None:

        def decoder(content: bytes) -> tuple[int, int, list[float]]:
            # STUB: replace with PIL/ffmpeg/torchaudio for real media.
            n = len(content)
            width = (n % 64) + 1
            height = (n % 48) + 1
            feature = [float((content[i % n] if n else 0) + i) for i in range(8)]
            return width, height, feature

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len),
                "digest": pdf["content"].map(lambda b: hashlib.md5(b).hexdigest()),
            }
            dims = pdf["content"].map(decoder)
            out["width"] = dims.map(lambda d: d[0]).astype("int32")
            out["height"] = dims.map(lambda d: d[1]).astype("int32")
            out["feature"] = dims.map(lambda d: d[2])
            yield pd.DataFrame(out)

    return df.mapInPandas(op, FEATURE_SCHEMA)


def png_feature_decoder():
    """The ``decode_features`` seam FILLED with a real decoder: returns
    a ``bytes -> (width, height, feature[8])`` callable that fully
    decodes PNG content (``pngcodec``: inflate + defilter + palette)
    and emits per-channel mean/std of the decoded pixel matrix as the
    feature vector (zero-padded to 8 dims). Undecodable bytes yield
    (0, 0, zeros) rather than fake dimensions — distinguishable from
    any real image. Built as a factory so the returned closure ships by
    value through cloudpickle (workers need no package install).

    Usage: ``decode_features(media, decoder=png_feature_decoder())``.
    """
    _decode = pngcodec.decode_png

    def decoder(content: bytes) -> tuple[int, int, list[float]]:
        got = _decode(content)
        if got is None:
            return 0, 0, [0.0] * 8
        w, h, _ch, px = got
        f = px.reshape(-1, px.shape[2]).astype("float64")
        stats = list(f.mean(axis=0)) + list(f.std(axis=0))
        return w, h, [float(x) for x in (stats + [0.0] * 8)[:8]]

    return decoder


#: decode_media output: real header-derived metadata per media row.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("codec", T.StringType(), True),  # ppm|pgm|png|wav|None
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_us", T.LongType(), True),
        T.StructField("valid", T.BooleanType(), False),
        # md5 of the DECODED pixel bytes (netpbm payload / PNG defiltered
        # + palette-expanded matrix): proves the image decode is real.
        T.StructField("pixel_md5", T.StringType(), True),
    ]
)


def decode_media(df: DataFrame) -> DataFrame:
    """REAL (not stubbed) media decoding, no codec library:

    - PPM/PGM (netpbm P6/P5): width, height, maxval token parse with
      comment handling; ``valid`` checks the payload actually holds
      width*height*bytes-per-pixel of pixel data.
    - PNG: full compressed decode via the pure-stdlib ``pngcodec``
      (zlib inflate, all five scanline filters, palette expansion);
      ``valid`` requires the pixels to actually reconstruct, and
      ``pixel_md5`` digests the decoded matrix. Recognized-but-
      unsupported variants (16-bit, Adam7) report codec='png',
      valid=false.
    - GIF: first-frame LZW decode via ``gifcodec`` (pure-Python LZW,
      palette -> RGB, interlace reorder); same valid/pixel_md5
      contract as PNG.
    - JPEG: baseline-sequential decode via ``jpegcodec`` (Huffman +
      dequant + IDCT + chroma upsampling + YCbCr->RGB, pure numpy);
      progressive/12-bit report codec='jpeg', valid=false.
    - WAV (RIFF): fmt chunk -> channels / sample_rate / bits, data chunk
      -> frame count and duration_us.
    - MP3: real frame-by-frame bitstream walk via ``mp3codec`` (sync +
      version/layer bits, published bitrate/sample-rate index tables,
      ID3v2/ID3v1 tag skip) -> channels / sample_rate / MPEG frame
      count / exact duration_us; ``valid`` requires the framing to be
      consistent to EOF (truncated or garbage-tailed streams report
      valid=false). PCM synthesis stays behind ``decode_features``.
    - AVI/MJPEG (RIFF): container walk via ``avicodec`` (avih/strh
      headers -> width/height/frame count/duration), then a REAL
      baseline-JPEG decode of the first frame through ``jpegcodec`` —
      ``pixel_md5`` digests those decoded pixels, and ``valid``
      additionally requires every frame chunk the header promises to be
      present in ``movi`` (truncated containers report valid=false).

    Unrecognized magics yield ``codec = NULL, valid = false`` — the
    residue is LOSSY codecs (JPEG/MP3/video) whose libraries are absent
    here; those remain behind the ``decode_features`` seam. Runs as
    mapInPandas over Arrow batches like every media pass; parsers are
    defined inside this function (or shipped by value from
    ``pngcodec``'s cloudpickle registration) so workers need no package
    install.
    """
    _parse_ihdr = pngcodec.parse_ihdr
    _decode_png = pngcodec.decode_png
    _parse_screen = gifcodec.parse_screen
    _decode_gif = gifcodec.decode_gif
    _parse_sof = jpegcodec.parse_sof
    _decode_jpeg = jpegcodec.decode_jpeg
    _parse_avi = avicodec.parse_avi
    _frame_offsets = avicodec.frame_offsets
    _parse_mp3 = mp3codec.parse_mp3

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        def parse_pnm(b: bytes):
            # P6 = RGB (3 bytes/px), P5 = grayscale (1 byte/px);
            # header tokens separated by whitespace, '#' comments to EOL,
            # exactly one whitespace byte after maxval before pixels.
            magic = bytes(b[:2])
            if magic not in (b"P6", b"P5"):
                return None
            i, vals = 2, []
            while len(vals) < 3 and i < len(b):
                c = b[i : i + 1]
                if c.isspace():
                    i += 1
                    continue
                if c == b"#":
                    j = b.find(b"\n", i)
                    i = j + 1 if j != -1 else len(b)
                    continue
                j = i
                while j < len(b) and not b[j : j + 1].isspace():
                    j += 1
                try:
                    vals.append(int(b[i:j]))
                except ValueError:
                    return None
                i = j
            if len(vals) < 3 or i >= len(b):
                return None
            i += 1  # the single whitespace after maxval
            w, h, maxval = vals
            if w < 0 or h < 0 or not (0 < maxval < 65536):
                return None
            bpp = (3 if magic == b"P6" else 1) * (2 if maxval > 255 else 1)
            complete = len(b) - i >= w * h * bpp
            return {
                "codec": "ppm" if magic == b"P6" else "pgm",
                "width": w,
                "height": h,
                "channels": 3 if magic == b"P6" else 1,
                "valid": complete,
                "pixel_md5": (
                    hashlib.md5(b[i : i + w * h * bpp]).hexdigest()
                    if complete
                    else None
                ),
            }

        def parse_png(b: bytes):
            hdr = _parse_ihdr(b)
            if hdr is None:
                return None
            got = _decode_png(b)
            if got is None:  # truncated/corrupt, or 16-bit/interlaced
                return {
                    "codec": "png",
                    "width": hdr["width"],
                    "height": hdr["height"],
                    "channels": hdr["channels"],
                    "valid": False,
                }
            w, h, ch, px = got
            return {
                "codec": "png",
                "width": w,
                "height": h,
                "channels": ch,
                "valid": True,
                "pixel_md5": hashlib.md5(px.tobytes()).hexdigest(),
            }

        def parse_gif(b: bytes):
            scr = _parse_screen(b)
            if scr is None:
                return None
            got = _decode_gif(b)
            if got is None:  # truncated/corrupt LZW or palette
                return {
                    "codec": "gif",
                    "width": scr["width"],
                    "height": scr["height"],
                    "channels": 3,
                    "valid": False,
                }
            w, h, ch, px = got
            return {
                "codec": "gif",
                "width": w,
                "height": h,
                "channels": ch,
                "valid": True,
                "pixel_md5": hashlib.md5(px.tobytes()).hexdigest(),
            }

        def parse_jpeg(b: bytes):
            sof = _parse_sof(b)
            if sof is None:
                return None
            got = _decode_jpeg(b) if sof["baseline"] else None
            if got is None:  # truncated/corrupt, or progressive/12-bit
                return {
                    "codec": "jpeg",
                    "width": sof["width"],
                    "height": sof["height"],
                    "channels": sof["channels"],
                    "valid": False,
                }
            w, h, ch, px = got
            return {
                "codec": "jpeg",
                "width": w,
                "height": h,
                "channels": ch,
                "valid": True,
                "pixel_md5": hashlib.md5(px.tobytes()).hexdigest(),
            }

        def parse_avi_mjpeg(b: bytes):
            hdr = _parse_avi(b)
            if hdr is None:
                return None
            spans = _frame_offsets(b) or []
            n = hdr["n_frames"]
            usec = hdr["usec_per_frame"]
            first = None
            if spans:
                off, size = spans[0]
                first = _decode_jpeg(b[off : off + size])
            return {
                "codec": "mjpeg",
                "width": hdr["width"],
                "height": hdr["height"],
                "channels": first[2] if first else None,
                "n_frames": n,
                "duration_us": n * usec,
                # header-promised frames all present AND the first one
                # actually reconstructs through the real JPEG decode.
                "valid": len(spans) == n and n > 0 and first is not None,
                "pixel_md5": (
                    hashlib.md5(first[3].tobytes()).hexdigest()
                    if first
                    else None
                ),
            }

        def parse_wav(b: bytes):
            import struct

            if len(b) < 12 or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
                return None
            i = 12
            fmt = None
            data_size = None
            while i + 8 <= len(b):
                cid = bytes(b[i : i + 4])
                (csize,) = struct.unpack_from("<I", b, i + 4)
                if cid == b"fmt " and i + 8 + 16 <= len(b):
                    _af, ch, rate, _br, block, _bits = struct.unpack_from(
                        "<HHIIHH", b, i + 8
                    )
                    fmt = (ch, rate, block)
                elif cid == b"data":
                    # Clamp for frame math, but remember truncation: a
                    # data chunk whose declared size overruns the blob is
                    # an incomplete payload, valid=False — mirroring the
                    # netpbm w*h*bpp completeness check above.
                    data_size = min(csize, len(b) - i - 8)
                    data_complete = csize <= len(b) - i - 8
                i += 8 + csize + (csize & 1)  # chunks are word-aligned
            if fmt is None or data_size is None:
                return None
            ch, rate, block = fmt
            if ch <= 0 or rate <= 0 or block <= 0:
                return None
            n_frames = data_size // block
            return {
                "codec": "wav",
                "channels": ch,
                "sample_rate": rate,
                "n_frames": n_frames,
                "duration_us": n_frames * 1_000_000 // rate,
                "valid": data_complete,
            }

        def parse_mp3(b: bytes):
            got = _parse_mp3(b)
            if got is None:
                return None
            return {
                "codec": "mp3",
                "channels": got["channels"],
                "sample_rate": got["sample_rate"],
                "n_frames": got["n_frames"],
                "duration_us": got["duration_us"],
                "valid": got["complete"],
            }

        def decode(b: bytes) -> dict:
            got = (
                parse_pnm(b) or parse_png(b) or parse_gif(b)
                or parse_jpeg(b) or parse_avi_mjpeg(b) or parse_wav(b)
                or parse_mp3(b)
            )
            base = {
                "codec": None,
                "width": None,
                "height": None,
                "channels": None,
                "sample_rate": None,
                "n_frames": None,
                "duration_us": None,
                "valid": False,
                "pixel_md5": None,
            }
            if got:
                base.update(got)
            return base

        for pdf in batches:
            decoded = pdf["content"].map(decode)
            out = {"media_id": pdf["media_id"], "kind": pdf["kind"]}
            for fld in (
                "codec", "width", "height", "channels", "sample_rate",
                "n_frames", "duration_us", "valid", "pixel_md5",
            ):
                out[fld] = decoded.map(lambda d, f=fld: d[f])
            o = pd.DataFrame(out)
            o["width"] = o["width"].astype("Int32")
            o["height"] = o["height"].astype("Int32")
            o["channels"] = o["channels"].astype("Int32")
            o["sample_rate"] = o["sample_rate"].astype("Int32")
            o["n_frames"] = o["n_frames"].astype("Int64")
            o["duration_us"] = o["duration_us"].astype("Int64")
            yield o

    return df.mapInPandas(op, DECODE_SCHEMA)


#: resize_media output: the transformed image + its new geometry.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def resize_media(df: DataFrame, *, factor: int = 2) -> DataFrame:
    """REAL image downsampling for every decodable image format:
    nearest-neighbor subsample every ``factor``-th pixel (numpy stride
    slicing over the pixel matrix) and re-emit valid bytes with the new
    geometry — netpbm P6/P5 in and out, PNG in and out (full
    inflate/defilter through ``pngcodec``, re-encoded as a
    standards-valid PNG; palette images come back as plain RGB), and
    GIF in and out (LZW decode through ``gifcodec``, re-encoded with a
    palette rebuilt from the subsample's unique colors), and baseline
    JPEG in and out (``jpegcodec`` decode, quality-90 re-encode — the
    one inherently lossy hop). Undecodable rows pass through with NULL
    codec/content — the residue is audio/video codecs (MP3/H.264 etc.)
    that genuinely need external libraries.

    Arrow-batched mapInPandas like every media pass; per-row cost is one
    numpy reshape + strided copy (plus DEFLATE for PNG), no Python
    pixel loops.
    """
    import numpy as np

    k = int(factor)
    if k < 1:
        raise ValueError("factor must be >= 1")
    _decode_png = pngcodec.decode_png
    _encode_png = pngcodec.encode_png
    _decode_gif = gifcodec.decode_gif
    _encode_gif = gifcodec.encode_gif
    _decode_jpeg = jpegcodec.decode_jpeg
    _encode_jpeg = jpegcodec.encode_jpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize_png(b: bytes):
            got = _decode_png(b)
            if got is None:
                return None
            _w, _h, _ch, px = got
            sub = np.ascontiguousarray(px[::k, ::k, :])
            out = _encode_png(sub)
            return ("png", sub.shape[1], sub.shape[0], out, len(out))

        def resize_gif(b: bytes):
            got = _decode_gif(b)
            if got is None:
                return None
            _w, _h, _ch, px = got
            sub = np.ascontiguousarray(px[::k, ::k, :])
            # a stride subsample of a paletted image stays paletted:
            # rebuild the (<= original-size) palette from unique colors
            pal, inv = np.unique(
                sub.reshape(-1, 3), axis=0, return_inverse=True
            )
            idx = inv.astype(np.uint8).reshape(sub.shape[0], sub.shape[1])
            out = _encode_gif(idx, pal.astype(np.uint8))
            return ("gif", sub.shape[1], sub.shape[0], out, len(out))

        def resize_jpeg(b: bytes):
            got = _decode_jpeg(b)
            if got is None:
                return None
            _w, _h, _ch, px = got
            sub = np.ascontiguousarray(px[::k, ::k, :])
            # re-encoding is lossy by nature (the JPEG trade); high
            # quality keeps the pass usable as a pipeline step
            out = _encode_jpeg(
                sub if sub.shape[2] == 3 else sub[:, :, 0], quality=90
            )
            return ("jpeg", sub.shape[1], sub.shape[0], out, len(out))

        def resize_one(b: bytes):
            magic = bytes(b[:2])
            if magic not in (b"P6", b"P5"):
                return resize_png(b) or resize_gif(b) or resize_jpeg(b)
            i, vals = 2, []
            while len(vals) < 3 and i < len(b):
                c = b[i : i + 1]
                if c.isspace():
                    i += 1
                    continue
                if c == b"#":
                    j = b.find(b"\n", i)
                    i = j + 1 if j != -1 else len(b)
                    continue
                j = i
                while j < len(b) and not b[j : j + 1].isspace():
                    j += 1
                try:
                    vals.append(int(b[i:j]))
                except ValueError:
                    return None
                i = j
            if len(vals) < 3 or i >= len(b):
                return None
            i += 1
            w, h, maxval = vals
            if w <= 0 or h <= 0 or not (0 < maxval < 256):
                return None  # 16-bit netpbm left to the codec seam
            ch = 3 if magic == b"P6" else 1
            need = w * h * ch
            if len(b) - i < need:
                return None
            arr = np.frombuffer(b, dtype=np.uint8, count=need, offset=i)
            arr = arr.reshape(h, w, ch)[::k, ::k, :]
            nh, nw = arr.shape[0], arr.shape[1]
            header = f"{magic.decode()}\n{nw} {nh}\n{maxval}\n".encode()
            out = header + np.ascontiguousarray(arr).tobytes()
            return (
                "ppm" if magic == b"P6" else "pgm", nw, nh, out, len(out)
            )

        for pdf in batches:
            res = pdf["content"].map(resize_one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": res.map(lambda r: r[0] if r else None),
                    "width": res.map(lambda r: r[1] if r else None).astype("Int32"),
                    "height": res.map(lambda r: r[2] if r else None).astype("Int32"),
                    "content": res.map(lambda r: r[3] if r else None),
                    "n_bytes": res.map(lambda r: r[4] if r else None).astype("Int64"),
                }
            )

    return df.mapInPandas(op, RESIZE_SCHEMA)


#: dhash_media output: the 63-bit perceptual difference-hash.
DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def dhash_media(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash — the public average/gradient
    hash family, e.g. Krawetz 2013 "Kind of Like That") per decodable
    image: grayscale the pixels, nearest-neighbor sample a 10x7 grid,
    and set bit ``y*9 + x`` iff ``g[y][x] > g[y][x+1]`` — 63 bits, so
    near-identical images (recompression, small edits, single-pixel
    noise) land within a small hamming distance and exact re-encodes
    collide exactly. 63 bits, not the classic 64: bit 63 is the sign
    bit, which DuckDB refuses to shift into while Spark wraps (the
    same portability boundary as bloom_sketch's word packing), and a
    nonnegative hash keeps cross-engine ``bit_count(xor(...))``
    semantics trivial.

    Deterministic integer arithmetic end-to-end — grayscale is
    ``(r + g + b) div 3`` (the byte itself for single-channel; an
    alpha channel is stripped before averaging, so RGB and opaque
    RGBA encodings of the same pixels hash identically), grid
    sample (x, y) reads pixel ``(x*W div 10, y*H div 7)`` — so the
    hash is bit-identical in any engine given the same pixels (the
    gate's oracle recomputes it in SQL over a constructed netpbm
    payload). Decodes netpbm P6/P5 directly and PNG/GIF/JPEG through
    the pure-Python codecs; undecodable rows yield NULL codec/dhash.
    Pair this with ``dedup.hamming_near_pairs`` for corpus-scale image
    near-dup detection (pigeonhole chunk blocking — no all-pairs
    join). Arrow-batched mapInPandas; per-row cost is the decode plus
    a 70-sample numpy gather.
    """
    return df.mapInPandas(_dhash_ops(wide=False), DHASH_SCHEMA)


#: dhash128_media output: two 63-bit words [horizontal, vertical].
DHASH128_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("dhash", T.ArrayType(T.LongType()), True),
    ]
)


def dhash128_media(df: DataFrame) -> DataFrame:
    """Wide (126-bit) perceptual difference-hash: the 63-bit
    HORIZONTAL-gradient word of :func:`dhash_media` plus a 63-bit
    VERTICAL-gradient word — grid sample 9x8 (``(x*W div 9,
    y*H div 8)``), bit ``y*9 + x`` iff ``g[y][x] > g[y+1][x]`` — the
    standard both-directions dHash variant used at 128-bit pHash/
    SimHash width for image corpora, packed as ``array<bigint>``
    ``[horizontal, vertical]`` (63 bits per word, the cross-engine
    packing boundary shared with bloom_sketch). Same deterministic
    integer arithmetic, decode paths, and NULL behavior as
    :func:`dhash_media`; images narrower than 2px in EITHER axis
    yield NULL (the vertical gradient needs >= 2 rows). Pair with
    ``dedup.hamming_near_pairs_words(words=2)`` — doubling the hash
    width roughly squares the single-word false-candidate rate while
    the pigeonhole plan cost stays linear in the chunk count.
    """
    return df.mapInPandas(_dhash_ops(wide=True), DHASH128_SCHEMA)


def _dhash_ops(wide: bool):
    """Closure factory for both dHash mapInPandas ops — everything the
    worker needs is a local of this call (cloudpickle ships it by
    value; module-global references would need the package on worker
    PYTHONPATH). ``wide=False`` emits the single horizontal word,
    ``wide=True`` the ``[horizontal, vertical]`` pair."""
    import numpy as np

    _decode_png = pngcodec.decode_png
    _decode_gif = gifcodec.decode_gif
    _decode_jpeg = jpegcodec.decode_jpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def parse_pnm_px(b: bytes):
            magic = bytes(b[:2])
            if magic not in (b"P6", b"P5"):
                return None
            i, vals = 2, []
            while len(vals) < 3 and i < len(b):
                c = b[i : i + 1]
                if c.isspace():
                    i += 1
                    continue
                if c == b"#":
                    j = b.find(b"\n", i)
                    i = j + 1 if j != -1 else len(b)
                    continue
                j = i
                while j < len(b) and not b[j : j + 1].isspace():
                    j += 1
                try:
                    vals.append(int(b[i:j]))
                except ValueError:
                    return None
                i = j
            if len(vals) < 3 or i >= len(b):
                return None
            i += 1
            w, h, maxval = vals
            if w <= 0 or h <= 0 or not (0 < maxval < 256):
                return None
            ch = 3 if magic == b"P6" else 1
            need = w * h * ch
            if len(b) - i < need:
                return None
            arr = np.frombuffer(b, dtype=np.uint8, count=need, offset=i)
            return ("ppm" if ch == 3 else "pgm", arr.reshape(h, w, ch))

        def decode_px(b: bytes):
            got = parse_pnm_px(b)
            if got is not None:
                return got
            for name, dec in (
                ("png", _decode_png),
                ("gif", _decode_gif),
                ("jpeg", _decode_jpeg),
            ):
                r = dec(b)
                if r is not None:
                    _w, _h, _ch, px = r
                    return (name, px)
            return None

        def pack_bits(bits):
            # bits: 2-D bool, bit b = row*ncols + col after reshape
            val = 0
            for b_idx in np.flatnonzero(bits.reshape(-1)):
                val |= 1 << int(b_idx)
            return val

        def dhash_one(b: bytes):
            got = decode_px(bytes(b))
            if got is None:
                return None
            codec, px = got
            h, w = px.shape[0], px.shape[1]
            if w < 2 or h < (2 if wide else 1):
                return None
            # integer grayscale: (r+g+b) div 3; single channel as-is.
            # Alpha is stripped FIRST (PNG color types 4/6 decode to
            # 2/4 channels): averaging it in would make the same
            # pixels hash differently as RGB vs opaque RGBA and flip
            # bits near ties — breaking "exact re-encodes collide".
            if px.ndim == 3 and px.shape[2] == 4:
                px = px[:, :, :3]
            elif px.ndim == 3 and px.shape[2] == 2:
                px = px[:, :, :1]
            g = (
                px.astype(np.int64).sum(axis=2) // px.shape[2]
                if px.ndim == 3
                else px.astype(np.int64)
            )
            xs = (np.arange(10, dtype=np.int64) * w) // 10
            ys = (np.arange(7, dtype=np.int64) * h) // 7
            grid = g[np.ix_(ys, xs)]  # 7 x 10
            w0 = pack_bits(grid[:, :-1] > grid[:, 1:])  # bit y*9+x
            if not wide:
                return (codec, w0)
            xsv = (np.arange(9, dtype=np.int64) * w) // 9
            ysv = (np.arange(8, dtype=np.int64) * h) // 8
            gv = g[np.ix_(ysv, xsv)]  # 8 x 9
            w1 = pack_bits(gv[:-1, :] > gv[1:, :])  # 7x9, bit y*9+x
            return (codec, [w0, w1])

        for pdf in batches:
            res = pdf["content"].map(dhash_one)
            dh = res.map(lambda r: r[1] if r else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": res.map(lambda r: r[0] if r else None),
                    "dhash": dh if wide else dh.astype("Int64"),
                }
            )

    return op


#: resample_media output: the transformed audio + its new timing.
RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_us", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resample_media(df: DataFrame, *, factor: int = 2) -> DataFrame:
    """REAL audio decimation for RIFF WAV: keep every ``factor``-th
    frame (numpy stride over the block-aligned sample matrix), emit a
    valid WAV whose fmt chunk carries ``rate/factor`` — duration is
    preserved, resolution drops (plain decimation; an anti-alias filter
    belongs to a DSP library behind this same seam). Non-WAV rows pass
    through with NULLs. Arrow-batched mapInPandas like every media pass.
    """
    import struct

    import numpy as np

    k = int(factor)
    if k < 1:
        raise ValueError("factor must be >= 1")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resample_one(b: bytes):
            if len(b) < 12 or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
                return None
            i = 12
            fmt = None
            data_off = data_size = None
            while i + 8 <= len(b):
                cid = bytes(b[i : i + 4])
                (csize,) = struct.unpack_from("<I", b, i + 4)
                if cid == b"fmt " and i + 8 + 16 <= len(b):
                    af, ch, rate, _br, block, bits = struct.unpack_from(
                        "<HHIIHH", b, i + 8
                    )
                    fmt = (af, ch, rate, block, bits)
                elif cid == b"data":
                    data_off = i + 8
                    data_size = min(csize, len(b) - data_off)
                i += 8 + csize + (csize & 1)
            if fmt is None or data_off is None:
                return None
            af, ch, rate, block, bits = fmt
            if ch <= 0 or rate <= 0 or block <= 0 or rate % k:
                return None  # non-divisible rates -> the DSP seam
            n_frames = data_size // block
            frames = np.frombuffer(
                b, dtype=np.uint8, count=n_frames * block, offset=data_off
            ).reshape(n_frames, block)[::k]
            new_rate = rate // k
            nf = frames.shape[0]
            data = np.ascontiguousarray(frames).tobytes()
            out = (
                b"RIFF"
                + struct.pack("<I", 4 + 24 + 8 + len(data))
                + b"WAVE"
                + b"fmt "
                + struct.pack("<I", 16)
                + struct.pack(
                    "<HHIIHH", af, ch, new_rate, new_rate * block, block, bits
                )
                + b"data"
                + struct.pack("<I", len(data))
                + data
            )
            return (
                "wav", ch, new_rate, nf,
                nf * 1_000_000 // new_rate, out,
            )

        for pdf in batches:
            res = pdf["content"].map(resample_one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": res.map(lambda r: r[0] if r else None),
                    "channels": res.map(lambda r: r[1] if r else None).astype("Int32"),
                    "sample_rate": res.map(lambda r: r[2] if r else None).astype("Int32"),
                    "n_frames": res.map(lambda r: r[3] if r else None).astype("Int64"),
                    "duration_us": res.map(lambda r: r[4] if r else None).astype("Int64"),
                    "content": res.map(lambda r: r[5] if r else None),
                }
            )

    return df.mapInPandas(op, RESAMPLE_SCHEMA)


def frame_sample(df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: slice the binary payload at a stride.

    For video this is where a real frame extractor plugs in; the slicing
    here is Catalyst `substring` on binary — JVM-side, zero Python.
    """
    frames = F.array(
        *[
            F.substring(F.col("content"), i * every_n_bytes + 1, every_n_bytes)
            for i in range(max_frames)
        ]
    )
    return df.select(
        "media_id",
        "kind",
        F.filter(frames, lambda fr: F.length(fr) > 0).alias("frames"),
    )


#: sample_frames output: one row per KEPT video frame, really decoded.
FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("pixel_md5", T.StringType(), True),
    ]
)


def sample_frames(df: DataFrame, *, every: int = 2) -> DataFrame:
    """REAL video frame sampling: keep every ``every``-th frame of each
    AVI/MJPEG container and decode the kept frames through the baseline
    JPEG codec — one output row per kept frame with its true geometry
    and a digest of the DECODED pixels.

    The retired `frame_sample` byte-stride stub is superseded by this
    for AVI inputs: the container walk (``avicodec.frame_offsets``) is
    a chunk-header skip, so the pass reads headers for every frame but
    runs Huffman+IDCT only on the 1/``every`` frames it keeps — at
    corpus scale the decode cost tracks the SAMPLED frame count, not
    the video length. mapInPandas over Arrow batches like every media
    pass; rows fan out (one input video -> ceil(n/every) frames), so
    downstream sizing should budget bytes-per-output-row, not input
    row count. Non-AVI rows yield a single valid=false row at
    frame_idx -1 (auditable residue, same convention as decode_media's
    codec=NULL rows).
    """
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    _frame_offsets = avicodec.frame_offsets
    _decode_jpeg = jpegcodec.decode_jpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {
                "media_id": [], "frame_idx": [], "width": [], "height": [],
                "channels": [], "valid": [], "pixel_md5": [],
            }

            def emit(mid, idx, w, h, ch, ok, md5):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(idx)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["valid"].append(ok)
                rows["pixel_md5"].append(md5)

            for mid, b in zip(pdf["media_id"], pdf["content"]):
                spans = _frame_offsets(b)
                if not spans:
                    emit(int(mid), -1, None, None, None, False, None)
                    continue
                for idx in range(0, len(spans), every):
                    off, size = spans[idx]
                    got = _decode_jpeg(b[off : off + size])
                    if got is None:
                        emit(int(mid), idx, None, None, None, False, None)
                    else:
                        w, h, ch, px = got
                        emit(
                            int(mid), idx, w, h, ch, True,
                            hashlib.md5(px.tobytes()).hexdigest(),
                        )
            o = pd.DataFrame(rows)
            o["frame_idx"] = o["frame_idx"].astype("int32")
            o["width"] = o["width"].astype("Int32")
            o["height"] = o["height"].astype("Int32")
            o["channels"] = o["channels"].astype("Int32")
            yield o

    return df.mapInPandas(op, FRAME_SAMPLE_SCHEMA)


def real_feature_decoder():
    """The ``decode_features`` seam filled for EVERY format this package
    really decodes: dispatches on content to the netpbm / PNG / GIF /
    JPEG / AVI-MJPEG pixel decoders (per-channel mean/std of the decoded
    matrix; AVI uses frame 0) or the WAV sample parser (per-channel
    mean/std of the PCM samples), zero-padded to 8 dims. Bytes no codec
    here can decode yield (0, 0, zeros) — distinguishable from any real
    media, and the only content left for the deliberately-stub default
    (lossy audio payloads, inter-frame video). Built as a factory so the
    closure ships by value through cloudpickle.

    Usage: ``decode_features(media, decoder=real_feature_decoder())``.
    """
    import struct

    _png = pngcodec.decode_png
    _gif = gifcodec.decode_gif
    _jpeg = jpegcodec.decode_jpeg
    _spans = avicodec.frame_offsets

    def _pixel_stats(got):
        w, h, _ch, px = got[0], got[1], got[2], got[3]
        f = px.reshape(-1, px.shape[2]).astype("float64")
        stats = list(f.mean(axis=0)) + list(f.std(axis=0))
        return w, h, [float(x) for x in (stats + [0.0] * 8)[:8]]

    def _pnm(b: bytes):
        magic = bytes(b[:2])
        if magic not in (b"P6", b"P5"):
            return None
        import numpy as np

        i, vals = 2, []
        while len(vals) < 3 and i < len(b):
            c = b[i : i + 1]
            if c.isspace():
                i += 1
                continue
            if c == b"#":
                j = b.find(b"\n", i)
                i = j + 1 if j != -1 else len(b)
                continue
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            try:
                vals.append(int(b[i:j]))
            except ValueError:
                return None
            i = j
        if len(vals) < 3 or i >= len(b):
            return None
        i += 1
        w, h, maxval = vals
        ch = 3 if magic == b"P6" else 1
        if not (0 < maxval < 256) or len(b) - i < w * h * ch:
            return None
        px = np.frombuffer(b[i : i + w * h * ch], np.uint8).reshape(h, w, ch)
        return w, h, ch, px

    def _wav_stats(b: bytes):
        if len(b) < 12 or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
            return None
        import numpy as np

        i, fmt, data = 12, None, None
        while i + 8 <= len(b):
            cid = bytes(b[i : i + 4])
            (csize,) = struct.unpack_from("<I", b, i + 4)
            if cid == b"fmt " and i + 8 + 16 <= len(b):
                _af, ch, _rate, _br, _block, bits = struct.unpack_from(
                    "<HHIIHH", b, i + 8
                )
                fmt = (ch, bits)
            elif cid == b"data":
                data = b[i + 8 : i + 8 + min(csize, len(b) - i - 8)]
            i += 8 + csize + (csize & 1)
        if fmt is None or data is None or fmt[1] != 16 or fmt[0] <= 0:
            return None
        ch = fmt[0]
        s = np.frombuffer(data[: len(data) // (2 * ch) * 2 * ch], "<i2")
        if not len(s):
            return None
        m = s.reshape(-1, ch).astype("float64")
        stats = list(m.mean(axis=0)) + list(m.std(axis=0))
        return 0, 0, [float(x) for x in (stats + [0.0] * 8)[:8]]

    def decoder(content: bytes) -> tuple[int, int, list[float]]:
        for dec in (_pnm, _png, _gif, _jpeg):
            got = dec(content)
            if got is not None:
                return _pixel_stats(got)
        spans = _spans(content)
        if spans:
            off, size = spans[0]
            got = _jpeg(content[off : off + size])
            if got is not None:
                return _pixel_stats(got)
        got = _wav_stats(content)
        if got is not None:
            return got
        return 0, 0, [0.0] * 8

    return decoder
