#!/usr/bin/env python3
"""Measure perceptual image dedup (dhash_media + hamming_near_pairs)
at scale: N synthetic PPM images, D distinct bases, each base carrying
one near-duplicate variant (single-pixel perturbation) — the corpus
shape image dedup exists for (re-crawled/re-encoded assets).

Reports decode+hash throughput (the mapInPandas pass over real netpbm
bytes) and the pair phase's cost + recall: every constructed
(base, variant) couple must surface at hamming <= 2, and the blocked
plan must do it without an all-pairs join.

Usage: python tools/dhash_scale.py [n_images] [n_distinct]
Defaults: 200k images, 50k distinct bases (so 4 copies per base: the
base, its variant, and exact re-posts of both).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators.dedup import (
    hamming_near_pairs,
    hamming_near_pairs_words,
)
from sonnerie_spark.operators.multimodal import dhash128_media, dhash_media
from sonnerie_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("dhash_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    # 20x14 P6 PPMs built JVM-side. Pixels are 27 DIFFERENT md5s
    # concatenated (not repeat(md5, 27): a 32-char pattern sliding
    # against the 60-byte row stride makes every grid sample read the
    # same few md5 positions — low-entropy images whose dhashes
    # genuinely collide, a pathological corpus, not a hash defect).
    # Odd copies perturb the first pixel byte (the gate construction).
    chunks = ", ".join(
        f"md5(concat(cast(base AS string), '#', {k}))" for k in range(27)
    )
    media = (
        spark.range(n)
        .selectExpr(
            "id AS media_id",
            f"id % {d} AS base",
            "id % 2 AS odd",
        )
        .selectExpr(
            "media_id",
            f"substring(concat({chunks}), 1, 840) AS px0",
            "odd",
        )
        .selectExpr(
            "media_id",
            "'image' AS kind",
            "concat(encode('P6\\n20 14\\n255\\n', 'UTF-8'), encode("
            "CASE WHEN odd = 1 THEN concat(char(ascii(substring(px0, 1, 1))"
            " + 1), substring(px0, 2)) ELSE px0 END, 'UTF-8')) AS content",
            "cast(NULL AS map<string,string>) AS meta",
        )
    )

    t0 = time.time()
    hashes = dhash_media(media)
    hashes.write.format("noop").mode("overwrite").save()
    t_hash = time.time() - t0

    hashes = hashes.localCheckpoint(eager=True)  # isolate the pair phase
    t0 = time.time()
    pairs = hamming_near_pairs(
        hashes, "media_id", "dhash", bits=63, max_hamming=2
    )
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    # recall check on a sample of couples: base 2k vs variant 2k+1 of
    # the same base id land within hamming 2 (they differ by at most
    # one grid sample)
    sample = pairs.filter(
        (F.col("id_b") - F.col("id_a") == d) | (F.col("id_b") - F.col("id_a") == 1)
    ).count()

    print(
        f"DHASH: {n:,} images ({d:,} bases) | decode+hash {t_hash:.1f}s "
        f"= {n / t_hash / 1e3:.0f}k img/s | pairs (max_hamming=2) "
        f"{t_pairs:.1f}s -> {n_pairs:,} pairs ({sample:,} couple-aligned)"
    )

    # 128-bit (two-word) path: same corpus, dhash128_media +
    # hamming_near_pairs_words. The wide hash's win is precision —
    # coincidental 63-bit collisions between unrelated bases disappear
    # — at the same blocked-plan cost (3 chunk joins either way).
    t0 = time.time()
    hashes128 = dhash128_media(media)
    hashes128.write.format("noop").mode("overwrite").save()
    t_hash128 = time.time() - t0

    hashes128 = hashes128.localCheckpoint(eager=True)
    t0 = time.time()
    pairs128 = hamming_near_pairs_words(
        hashes128, "media_id", "dhash", words=2, max_hamming=2
    )
    n_pairs128 = pairs128.count()
    t_pairs128 = time.time() - t0
    sample128 = pairs128.filter(
        (F.col("id_b") - F.col("id_a") == d)
        | (F.col("id_b") - F.col("id_a") == 1)
    ).count()

    print(
        f"DHASH128: decode+hash {t_hash128:.1f}s "
        f"= {n / t_hash128 / 1e3:.0f}k img/s | pairs (max_hamming=2) "
        f"{t_pairs128:.1f}s -> {n_pairs128:,} pairs "
        f"({sample128:,} couple-aligned; 63-bit emitted {n_pairs:,})"
    )


if __name__ == "__main__":
    main()
