#!/usr/bin/env python3
"""Scale anchors for the incremental dedup machinery.

1. LshIndex: index a synthetic corpus, then measure the cost of
   detecting near-dups for a 1% arriving batch via the persistent index
   vs re-running the one-shot pair enumeration over the whole corpus.
2. connected_components: a synthetic multi-million-edge graph (chains +
   cliques, so both the propagation and the pointer-jumping matter);
   wall time, rounds, and a correctness spot-check.

Usage: python tools/dedup_scale.py [n_docs] [n_edges]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators import dedup, graph
from sonnerie_spark.session import get_spark


def synth_docs(spark, n: int):
    """Deterministic ~40-word documents with planted near-duplicates:
    every 50th doc is a light edit of its predecessor group."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64((F.col("gid") * 40 + i).cast("string")), F.lit(5000)),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        # gid collapses each run of 50 ids to one base text; the suffix
        # word makes the members near- (not exact-) duplicates
        (F.col("id") / 50).cast("long").alias("gid"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.concat_ws(" ", words),
            F.concat(F.lit("tail"), F.pmod(F.col("doc_id"), F.lit(7))),
        ).alias("text"),
    )


def lsh_anchor(spark, n_docs: int) -> None:
    docs = synth_docs(spark, n_docs)
    t0 = time.time()
    one_shot = dedup.minhash_lsh_pairs(docs, "doc_id", "text").count()
    t_once = time.time() - t0

    idx_dir = tempfile.mkdtemp(prefix="lsh_scale_")
    try:
        idx = dedup.LshIndex(spark, idx_dir)
        base = docs.filter(F.col("doc_id") < int(n_docs * 0.98))
        batch1 = docs.filter(
            (F.col("doc_id") >= int(n_docs * 0.98))
            & (F.col("doc_id") < int(n_docs * 0.99))
        )
        batch2 = docs.filter(F.col("doc_id") >= int(n_docs * 0.99))
        idx.add(base, "doc_id", "text").count()  # build (not timed here)
        t0 = time.time()
        batch_pairs = idx.add(batch1, "doc_id", "text").count()
        t_inc = time.time() - t0
        # same-size batch through the hot-bucket cap (the 100 TB knob)
        t0 = time.time()
        capped_pairs = idx.add(
            batch2, "doc_id", "text", max_bucket_size=64
        ).count()
        t_cap = time.time() - t0
        print(
            f"lsh: {n_docs} docs, one-shot {one_shot} pairs in {t_once:.1f}s; "
            f"1% batch via index: {batch_pairs} pairs in {t_inc:.1f}s "
            f"({t_once / t_inc:.1f}x); capped(64) 1% batch: "
            f"{capped_pairs} pairs in {t_cap:.1f}s"
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def cc_anchor(spark, n_edges: int) -> None:
    # half the edges form 1000-node chains (deep components — pointer
    # jumping's worst case), half form 100-node cliques (wide, heavy).
    half = n_edges // 2
    chains = spark.range(half).select(
        F.col("id").alias("id_a"),
        F.when(F.pmod("id", F.lit(1000)) == 999, F.col("id"))
        .otherwise(F.col("id") + 1)
        .alias("id_b"),
    )
    cliques = spark.range(half).select(
        (F.lit(10**9) + (F.col("id") / 4950).cast("long") * 100
         + F.pmod(F.xxhash64(F.col("id")), F.lit(100))).alias("id_a"),
        (F.lit(10**9) + (F.col("id") / 4950).cast("long") * 100
         + F.pmod(F.xxhash64(F.col("id") + 1), F.lit(100))).alias("id_b"),
    )
    edges = chains.unionByName(cliques)
    t0 = time.time()
    comps = graph.connected_components(edges, "id_a", "id_b")
    n_nodes = comps.count()
    n_comps = comps.select("comp").distinct().count()
    t = time.time() - t0
    # spot-check: every chain node's component is its chain's first id
    bad = comps.filter(
        (F.col("id") < 10**9) & (F.col("comp") != (F.col("id") / 1000).cast("long") * 1000)
    ).count()
    print(
        f"cc: {n_edges} edges, {n_nodes} nodes -> {n_comps} components "
        f"in {t:.1f}s; chain-label errors: {bad}"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("dedup_scale")
    lsh_anchor(spark, n_docs)
    cc_anchor(spark, n_edges)


if __name__ == "__main__":
    main()
