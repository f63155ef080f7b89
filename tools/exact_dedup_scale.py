#!/usr/bin/env python3
"""Scale anchor for incremental exact dedup (ExactIndex).

Builds a synthetic corpus with planted exact duplicates, indexes it,
then measures the cost of dedup-ing a 1% arriving batch via the
persistent index vs re-running a full-corpus exact dedup (hash + first-
occurrence aggregation over everything, the one-shot shape). The claim
under test: per-batch cost is O(batch + matching prefix partitions),
independent of corpus size — the probe's partition pruning reads only
the batch's own hash-prefix directories.

Usage: python tools/exact_dedup_scale.py [n_docs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sonnerie_spark.operators.dedup import ExactIndex  # noqa: E402
from sonnerie_spark.session import get_spark  # noqa: E402


def corpus(spark, n: int, start: int = 0):
    # ~10% of docs duplicate an earlier doc's text exactly; ~1 KB per
    # doc so the one-shot side pays a realistic rehash-the-corpus cost
    # (the quantity that grows with data volume at 100 TB).
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body "),
            F.when(
                F.col("id") % 10 == 9, (F.col("id") / 7).cast("long")
            ).otherwise(F.col("id")).cast("string"),
            F.repeat(F.lit(" lorem ipsum filler"), 52),
        ).alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch_size = max(1, n // 100)
    spark = get_spark("exact_dedup_scale")
    spark.range(1000).count()

    # The claim under test is the SCALING SHAPE, not a local ratio: the
    # per-batch incremental cost must stay ~flat as the corpus grows
    # (probe = the compact hash index, not the corpus), while the
    # one-shot full-corpus dedup grows linearly (it re-reads and
    # re-hashes every document ever ingested — at 100 TB that term is
    # the whole corpus scan). Measure both at n and 4n with the SAME
    # batch size. The corpus is materialized to parquet so the one-shot
    # side pays a real re-read like a real pipeline would.
    for scale in (n, 4 * n):
        path = tempfile.mkdtemp(prefix="exidx_scale_")
        store = tempfile.mkdtemp(prefix="exidx_corpus_")
        try:
            corpus(spark, scale).write.mode("overwrite").parquet(store)
            base = spark.read.parquet(store)
            idx = ExactIndex(spark, path)
            t0 = time.time()
            kept = idx.add(base, "doc_id", "text").count()
            t_base = time.time() - t0
            idx.compact()

            batch = corpus(spark, batch_size, start=scale)
            t0 = time.time()
            b_kept = idx.add(batch, "doc_id", "text").count()
            t_batch = time.time() - t0

            both = base.unionByName(batch)
            t0 = time.time()
            os_kept = (
                both.select("doc_id", F.md5("text").alias("h"))
                .groupBy("h")
                .agg(F.min("doc_id"))
                .count()
            )
            t_oneshot = time.time() - t0
            print(
                f"corpus {scale:>10,}: index-build {t_base:5.1f} s "
                f"({kept:,} unique); batch of {batch_size:,}: "
                f"incremental {t_batch:5.1f} s ({b_kept:,} kept) vs "
                f"one-shot {t_oneshot:5.1f} s ({os_kept:,} groups)"
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)
            shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
