"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Decoding comes in two tiers:

- ``decode_media``: REAL header-parse decoding for uncompressed formats
  that need no codec library — netpbm images (PPM/PGM: width/height)
  and RIFF WAV audio (channels/sample rate/frame count/duration).
- ``decode_features``: the remaining compressed-codec seam, stubbed
  behind a clearly-marked default because codec libraries (PIL /
  torchvision / ffmpeg) are not available in this environment; swap the
  ``decoder`` callable without touching the plan.

Pattern at 100 TB: media bytes travel as a ``binary`` column next to
typed metadata; decode/feature passes run as ``mapInPandas`` so each
Arrow batch amortizes Python crossing; partition sizing is driven by
``bytes_per_row`` not row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

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


#: decode_media output: real header-derived metadata per media row.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("codec", T.StringType(), True),  # ppm|pgm|wav|None
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_us", T.LongType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def decode_media(df: DataFrame) -> DataFrame:
    """REAL (not stubbed) media decoding for headerful uncompressed
    formats — pure-Python struct/text parsing, no codec library:

    - PPM/PGM (netpbm P6/P5): width, height, maxval token parse with
      comment handling; ``valid`` checks the payload actually holds
      width*height*bytes-per-pixel of pixel data.
    - WAV (RIFF): fmt chunk -> channels / sample_rate / bits, data chunk
      -> frame count and duration_us.

    Unrecognized magics yield ``codec = NULL, valid = false`` — that is
    where a compressed-codec library (PIL/ffmpeg) would plug in; only
    THOSE formats remain stubbed (``decode_features``). Runs as
    mapInPandas over Arrow batches like every media pass; parsers are
    defined inside this function so cloudpickle ships them by value.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
            return {
                "codec": "ppm" if magic == b"P6" else "pgm",
                "width": w,
                "height": h,
                "valid": len(b) - i >= w * h * bpp,
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

        def decode(b: bytes) -> dict:
            got = parse_pnm(b) or parse_wav(b)
            base = {
                "codec": None,
                "width": None,
                "height": None,
                "channels": None,
                "sample_rate": None,
                "n_frames": None,
                "duration_us": None,
                "valid": False,
            }
            if got:
                base.update(got)
            return base

        for pdf in batches:
            decoded = pdf["content"].map(decode)
            out = {"media_id": pdf["media_id"], "kind": pdf["kind"]}
            for fld in (
                "codec", "width", "height", "channels", "sample_rate",
                "n_frames", "duration_us", "valid",
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
    """REAL image downsampling for the headerful uncompressed formats:
    nearest-neighbor subsample every ``factor``-th pixel of a netpbm
    P6/P5 image (numpy stride slicing over the pixel matrix) and re-emit
    valid netpbm bytes with the new geometry. Non-netpbm/undecodable
    rows pass through with NULL codec/content — the seam where a codec
    library would handle compressed formats.

    Arrow-batched mapInPandas like every media pass; per-row cost is one
    numpy reshape + strided copy, no Python pixel loops.
    """
    import numpy as np

    k = int(factor)
    if k < 1:
        raise ValueError("factor must be >= 1")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize_one(b: bytes):
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
