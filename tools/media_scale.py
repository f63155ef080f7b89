#!/usr/bin/env python3
"""Scale anchor for the video frame-sampling path.

Builds a synthetic MJPEG corpus (N videos x F frames of W x H grayscale,
real DCT/Huffman-encoded JPEG frames inside a real RIFF AVI container),
then measures ``sample_frames`` at several sampling rates. The claim
under test: decode cost tracks the KEPT frame count, not video length —
the container walk is a chunk-header skip, so `every=F` (one frame per
video) should cost ~1/F of `every=1` plus the fixed header-walk floor.

Also reports full-decode throughput (frames/s and decoded MB/s) as the
baseline number for budgeting a media pass at corpus scale.

Usage: python tools/media_scale.py [n_videos] [n_frames] [block_w] [block_h]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sonnerie_spark.operators import multimodal  # noqa: E402
from sonnerie_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    wb = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hb = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    spark = get_spark("media_scale")
    spark.range(1000).count()  # warm the JVM

    # Build the corpus ONCE, distributed, and persist it so every timed
    # pass reads identical bytes (the build is DCT work we must not time).
    def build(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from sonnerie_spark.operators import avicodec, jpegcodec

        for pdf in batches:
            out = []
            for vid in pdf["id"]:
                hx = hashlib.md5(str(int(vid)).encode()).hexdigest()
                frames = []
                for f in range(n_frames):
                    vals = np.array(
                        [
                            ord(hx[(b + f) % 32]) & ~1
                            for b in range(wb * hb)
                        ],
                        np.uint8,
                    ).reshape(hb, wb)
                    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
                    frames.append(jpegcodec.encode_jpeg(img, quality=50))
                out.append(
                    avicodec.encode_avi_mjpeg(
                        frames, width=wb * 8, height=hb * 8, fps=25
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"].astype("int64"),
                    "kind": "video",
                    "content": out,
                    "meta": None,
                }
            )

    media = (
        spark.range(n_videos)
        .repartition(32)
        .mapInPandas(build, multimodal.MEDIA_SCHEMA)
        .persist()
    )
    total_bytes = media.select(
        F.sum(F.length("content")).alias("b")
    ).collect()[0]["b"]
    px_bytes = wb * 8 * hb * 8  # grayscale frame, 1 byte/px
    print(
        f"corpus: {n_videos} videos x {n_frames} frames "
        f"({wb * 8}x{hb * 8}), {total_bytes / 1e6:.1f} MB of AVI"
    )

    def timed(every: int) -> tuple[float, int]:
        t0 = time.time()
        kept = multimodal.sample_frames(media, every=every).count()
        return time.time() - t0, kept

    timed(n_frames)  # warm the Python workers before any timed pass
    base_dt = None
    for every in (1, 5, n_frames):
        dt, kept = timed(every)
        fps = kept / dt
        note = ""
        if every == 1:
            base_dt = dt
            note = (
                f"  [full decode: {fps:,.0f} frames/s, "
                f"{fps * px_bytes / 1e6:.0f} decoded MB/s]"
            )
        elif base_dt:
            note = f"  [{base_dt / dt:.1f}x faster than every=1]"
        print(
            f"every={every:>3}: kept {kept:>7} frames in {dt:6.2f} s"
            f"{note}"
        )


if __name__ == "__main__":
    main()
