#!/usr/bin/env python3
"""Combined streaming soak: live ingest -> ContinuousRollup.stream() +
LshIndex.add() per micro-batch, with compaction interleaved.

The unit tests pin each streaming path alone (test_tail.py,
test_ann_streaming.py); this soak runs BOTH consumers against one live
source database through >= 50 micro-batches while the source is
minor/major-compacted and the LSH index itself is compacted mid-stream —
the cross-feature races (tail listing vs compaction's rename swap,
refresh cursor vs merged-run replay, index probe vs index compact) that
no single-path test can hit.

Convergence contract checked at the end:
- rollup == the batch ground-truth aggregate of Database.read()
  (tail replays from compaction are absorbed by the refresh cursor);
- the distinct union of per-batch LSH candidate pairs equals the
  ONE-SHOT minhash_lsh_pairs over the final corpus (uncapped), despite
  compaction re-emitting merged runs into the tail (re-adds are
  idempotent in pair space).

Usage: python tools/soak_streaming.py [n_commits]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.db import Database
from sonnerie_spark.operators.dedup import LshIndex, minhash_lsh_pairs
from sonnerie_spark.session import get_spark
from sonnerie_spark.streaming.rollup import ContinuousRollup
from sonnerie_spark.streaming.tail import tail_records

HOUR = 3600 * 10**9
T0 = 1577836800 * 10**9

VOCAB = (
    "the quick brown fox jumps over a lazy dog while rain falls on green "
    "hills and rivers run to the wide grey sea under cold autumn skies"
).split()


def doc_text(i: int) -> str:
    # overlapping windows over the vocab -> plenty of genuine near-dups
    w = [VOCAB[(i * 3 + j) % len(VOCAB)] for j in range(12)]
    return " ".join(w)


def run_soak(spark, root: str, n_commits: int) -> dict:
    """Run the soak; returns stats. Raises on any divergence."""
    db = Database(spark, os.path.join(root, "db"), buckets=8)
    roll = ContinuousRollup(db, os.path.join(root, "roll"), interval_ns=HOUR)
    idx = LshIndex(spark, os.path.join(root, "lsh"), k=2, num_hashes=8,
                   band_size=2)

    pair_store: set = set()

    def index_batch(batch_df, batch_id) -> None:
        docs = (
            batch_df.filter(F.size("v_str") > 0)
            .select(
                F.col("key").cast("long").alias("id"),
                F.element_at("v_str", 1).alias("text"),
            )
            .filter(F.col("id").isNotNull())
        )
        if not docs.take(1):
            return
        for r in idx.add(docs, "id", "text").collect():
            pair_store.add((r["id_a"], r["id_b"]))

    q_roll = roll.stream(os.path.join(root, "ck_roll"))
    q_lsh = (
        tail_records(db)
        .writeStream.foreachBatch(index_batch)
        .option("checkpointLocation", os.path.join(root, "ck_lsh"))
        .start()
    )

    t0 = time.time()
    doc_id = 0
    try:
        for c in range(n_commits):
            tx = db.create_tx()
            for _ in range(8):
                tx.add_record(
                    f"{doc_id:06d}", T0 + doc_id * 60 * 10**9, "us",
                    [doc_id % 97, doc_text(doc_id)],
                )
                doc_id += 1
            # every 5th commit also LWW-overwrites an earlier record
            if c % 5 == 4:
                victim = max(0, doc_id - 40)
                tx2 = db.create_tx()
                tx2.add_record(
                    f"{victim:06d}", T0 + victim * 60 * 10**9, "us",
                    [999, doc_text(victim)],
                )
                tx2.commit()
            tx.commit()

            # drain: one (or two) micro-batches per commit on each query
            q_roll.processAllAvailable()
            q_lsh.processAllAvailable()

            if c % 10 == 9:
                db.compact(major=(c % 20 == 19))  # interleaved compaction
            if c % 17 == 16:
                idx.compact()  # index debris compaction mid-stream
        q_roll.processAllAvailable()
        q_lsh.processAllAvailable()
    finally:
        q_roll.stop()
        q_lsh.stop()
    t_soak = time.time() - t0

    rb = int(q_roll.lastProgress["batchId"]) + 1 if q_roll.lastProgress else 0
    lb = int(q_lsh.lastProgress["batchId"]) + 1 if q_lsh.lastProgress else 0
    print(f"soak: {n_commits} commit rounds, {doc_id} docs, "
          f"{rb} rollup batches, {lb} lsh batches, {t_soak:.1f}s")
    assert rb >= n_commits and lb >= n_commits, (rb, lb)

    # -- convergence: rollup == batch ground truth ----------------------
    truth = {
        (x["key"], x["bucket_ts"]): (x["n"], x["sum"])
        for x in db.read()
        .select(
            "key",
            (F.col("ts") - F.pmod("ts", F.lit(HOUR))).alias("bucket_ts"),
            F.element_at("v_long", 1).cast("double").alias("v"),
        )
        .groupBy("key", "bucket_ts")
        .agg(F.count("v").alias("n"), F.sum("v").alias("sum"))
        .collect()
    }
    got = {
        (x["key"], x["bucket_ts"]): (x["n"], x["sum"])
        for x in roll.read().collect()
    }
    assert got == truth and got, (
        f"rollup diverged: {len(got)} vs {len(truth)} buckets; "
        f"sample diff {sorted(set(got.items()) ^ set(truth.items()))[:4]}"
    )
    print(f"rollup converged: {len(got)} (key, bucket) groups match ground truth")

    # -- convergence: union of incremental pairs == one-shot ------------
    corpus = db.read().select(
        F.col("key").cast("long").alias("id"),
        F.element_at("v_str", 1).alias("text"),
    )
    oneshot = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus, "id", "text", k=2, num_hashes=8,
                                   band_size=2).collect()
    }
    assert pair_store == oneshot, (
        f"lsh pair union diverged: {len(pair_store)} incremental vs "
        f"{len(oneshot)} one-shot; "
        f"only-incremental {sorted(pair_store - oneshot)[:4]} "
        f"only-oneshot {sorted(oneshot - pair_store)[:4]}"
    )
    print(f"lsh index converged: {len(oneshot)} candidate pairs match one-shot")

    return {
        "commits": n_commits,
        "docs": doc_id,
        "rollup_batches": rb,
        "lsh_batches": lb,
        "pairs": len(oneshot),
        "seconds": round(t_soak, 1),
    }


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = tempfile.mkdtemp(prefix="soak_")
    # Tiny per-batch data: low shuffle-partition count keeps each
    # micro-batch's job scheduling cost proportional to its size.
    spark = get_spark("soak_streaming", shuffle_partitions=4)
    try:
        run_soak(spark, root, n_commits)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print("SOAK OK")


if __name__ == "__main__":
    main()
