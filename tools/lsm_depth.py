#!/usr/bin/env python3
"""LSM depth cost: multi-run scan throughput vs the compacted single run.

Writes N records as R equal runs (every run overwrites nothing — worst
case for dedup cardinality), measures the merged-view scan, then major-
compacts and measures again. With the bucketed run layout (bucketing.py)
the multi-run read dedups bucket-locally with no Exchange, so the gap to
the compacted scan should be a small constant (file-open + merge cost),
not the 15x full-shuffle cliff of the legacy layout (SCALE.md).

Usage: python tools/lsm_depth.py [n_records] [n_runs]
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
from sonnerie_spark.session import get_spark


def gen_run(spark, n: int, n_keys: int, run_i: int):
    # Distinct ts per run -> no (key, ts) collisions: every record
    # survives LWW, the dedup aggregation sees maximum cardinality.
    return spark.range(n).select(
        F.concat(
            F.lit("key"), F.lpad((F.col("id") % n_keys).cast("string"), 6, "0")
        ).alias("key"),
        ((F.col("id") / n_keys).cast("long") * 1000 + run_i).alias("ts"),
        F.lit("u").alias("fmt"),
        F.array(F.pmod(F.xxhash64("id"), F.lit(1000))).alias("v_long"),
        F.lit(None).cast("array<double>").alias("v_double"),
        F.lit(None).cast("array<string>").alias("v_str"),
        F.lit(None).cast("array<binary>").alias("v_bin"),
    )


def timed_scan(db, n: int, label: str) -> float:
    # Materialize the payload (sum over v_long sizes), not bare count():
    # count() on a single compacted run collapses to parquet metadata
    # and reads no data, which would inflate the multi-run/compacted
    # ratio with a scan that isn't one.
    t0 = time.time()
    row = db.read().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("v_long")).alias("m")
    ).collect()[0]
    dt = time.time() - t0
    print(f"{label}: {row.n} records in {dt:.1f}s = {row.n/dt/1e6:.2f} M rec/s")
    assert row.n == n, (row.n, n)
    return dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("lsm_depth")
    db_dir = tempfile.mkdtemp(prefix="lsm_depth_")
    db = Database(spark, os.path.join(db_dir, "db"))
    per_run = n // n_runs
    t0 = time.time()
    for r in range(n_runs):
        db.commit_dataframe(gen_run(spark, per_run, 10_000, r), check_duplicates=False)
    print(f"wrote {n_runs} runs x {per_run} records in {time.time()-t0:.1f}s")

    timed_scan(db, n, f"scan warm-up ({n_runs} runs)")
    t_multi = timed_scan(db, n, f"scan ({n_runs} runs, bucket-local LWW)")

    t0 = time.time()
    db.compact(major=True)
    print(f"major compaction: {time.time()-t0:.1f}s")
    timed_scan(db, n, "scan warm-up (1 run)")
    t_one = timed_scan(db, n, "scan (compacted single run)")
    print(f"depth cost: {n_runs}-run scan / compacted scan = {t_multi/t_one:.2f}x")
    shutil.rmtree(db_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
