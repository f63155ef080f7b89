#!/usr/bin/env python3
"""Scale anchor for corpus-wide paragraph dedup (dedup_paragraphs +
dedup_paragraphs_incremental).

Builds a synthetic corpus of multi-paragraph documents with planted
duplication (~33% of paragraphs drawn from a small shared pool, the
rest unique), runs the one-shot pass, and checks the survivor counts
against the ANALYTICALLY expected values (every unique paragraph
survives; each pool paragraph survives exactly once corpus-wide).
Then replays the same corpus as two batches through the persistent
ExactIndex form and checks the kept/removed totals match the one-shot
(survivor IDENTITY legitimately differs: batch precedence reorders
which copy wins, but per-hash exactly one copy survives either way).

The quantities that matter at 100 TB: the one-shot pass is one explode
+ ONE corpus shuffle on md5(paragraph) + the reassembly agg — no
all-pairs anything; the incremental pass costs O(batch + matching
prefix partitions) per batch.

Usage: python tools/paragraph_scale.py [n_docs] [paras_per_doc]
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
from sonnerie_spark.operators.text import (  # noqa: E402
    dedup_paragraphs,
    dedup_paragraphs_incremental,
)
from sonnerie_spark.session import get_spark  # noqa: E402

POOL = 10_000  # shared-paragraph pool size


def corpus(spark, n_docs: int, paras: int):
    # paragraph g = doc*paras + j; pool iff (doc + j) % 3 == 0 (~33%,
    # and — unlike a condition on g alone with paras odd — hits BOTH
    # doc parities, so the two-batch incremental replay below really
    # exercises cross-batch suppression), else unique
    parts = []
    for j in range(paras):
        gj = F.col("id") * paras + F.lit(j)
        parts.append(
            F.when(
                (F.col("id") + F.lit(j)) % 3 == 0,
                F.concat(F.lit("pool paragraph "), (gj % POOL).cast("string")),
            ).otherwise(
                F.concat(F.lit("unique paragraph body "), gj.cast("string"))
            )
        )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", *parts).alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    paras = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    total = n_docs * paras
    spark = get_spark("paragraph_scale")

    docs = corpus(spark, n_docs, paras).persist()
    docs.count()

    # analytical expectation (python replay of the corpus rule)
    pool_gs = [
        d * paras + j
        for d in range(n_docs)
        for j in range(paras)
        if (d + j) % 3 == 0
    ]
    exp_removed = len(pool_gs) - len({g % POOL for g in pool_gs})
    exp_kept = total - exp_removed

    t0 = time.time()
    out = dedup_paragraphs(docs, "doc_id", "text")
    agg = out.agg(
        F.sum("n_paragraphs").alias("np"),
        F.sum("n_removed").alias("nr"),
        F.count("*").alias("nd"),
    ).collect()[0]
    dt = time.time() - t0
    assert agg["nd"] == n_docs, agg
    assert agg["np"] == total, agg
    assert agg["nr"] == exp_removed, (agg["nr"], exp_removed)
    print(
        f"one-shot: {total:,} paragraphs / {n_docs:,} docs in {dt:.1f}s = "
        f"{total/dt/1e6:.2f} M para/s; removed {agg['nr']:,} "
        f"(= analytical), kept {exp_kept:,}"
    )

    root = tempfile.mkdtemp(prefix="para-scale-")
    try:
        idx = ExactIndex(spark, os.path.join(root, "idx"))
        kept = removed = 0
        for b in (0, 1):
            t0 = time.time()
            out_b = dedup_paragraphs_incremental(
                idx, docs.filter(F.col("doc_id") % 2 == b), "doc_id", "text"
            )
            a = out_b.agg(
                F.sum("n_paragraphs").alias("np"), F.sum("n_removed").alias("nr")
            ).collect()[0]
            dt = time.time() - t0
            kept += a["np"] - a["nr"]
            removed += a["nr"]
            print(
                f"incremental batch {b}: {a['np']:,} paragraphs in {dt:.1f}s "
                f"= {a['np']/dt/1e6:.2f} M para/s; removed {a['nr']:,}"
            )
        assert removed == exp_removed, (removed, exp_removed)
        assert kept == exp_kept, (kept, exp_kept)
        print(
            f"incremental == one-shot totals: kept {kept:,} / removed "
            f"{removed:,} (survivor identity differs by batch precedence; "
            f"per-hash exactly one copy survives both ways)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
