"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decoding is stubbed
behind clearly-marked seams because codec libraries are not available in
this environment. Swap ``_decode_image_stub`` for a real decoder (PIL /
torchvision / ffmpeg) without touching the plan.

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
