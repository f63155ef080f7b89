#!/usr/bin/env python3
"""Measure Database.agg_series (the driver-side Arrow fold) at scale.

Builds an N-row database (K series x N/K points, format 'u'), major-
compacts it to the steady state, then times the fold at 1/4/32 Arrow
CPU threads plus the warm Spark-plan fallback on the same data —
reproducing the SCALE.md per-series-aggregation row (the reference's
per-core Rayon fold, README.md:39-40, is the baseline axis).

Thread counts are measured in fresh subprocesses because pyarrow's CPU
pool cannot be resized once Acero has used it (thread-index crash).

Usage: python tools/fold_scale.py [rows] [keys]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_MEASURE = """
import sys, time
import pyarrow as pa
pa.set_cpu_count(int(sys.argv[2]))
sys.path.insert(0, {repo!r})
from sonnerie_spark import Database, get_spark
from sonnerie_spark.pointread import arrow_agg_series
import os
os.environ["SPARK_GRAFT_CPUS"] = "2"  # handle only; fold is driver-side
spark = get_spark(shuffle_partitions=2)
db = Database(spark, sys.argv[1])
best = None
for _ in range(3):
    t0 = time.time()
    rows = arrow_agg_series(db)
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
assert rows is not None
print(f"RESULT {{len(rows)}} {{sum(r['n'] for r in rows)}} {{best:.3f}}")
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import functions as F

    from sonnerie_spark import Database, get_spark
    from sonnerie_spark.pointread import arrow_agg_series

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="fold-scale-")
    db = Database(spark, os.path.join(root, "db"))

    t0 = time.time()
    df = spark.range(n).select(
        F.concat(F.lit("series-"), (F.col("id") % k).cast("string")).alias("key"),
        (F.col("id") / k).cast("long").alias("ts"),
        F.lit("u").alias("fmt"),
        F.array((F.col("id") % 997).cast("long")).alias("v_long"),
        F.lit(None).cast("array<double>").alias("v_double"),
        F.lit(None).cast("array<string>").alias("v_str"),
        F.lit(None).cast("array<binary>").alias("v_bin"),
    )
    db.commit_dataframe(df, check_duplicates=False)
    db.compact(major=True)
    print(f"built+compacted {n:,} rows x {k} keys in {time.time()-t0:.1f}s")

    for threads in (1, 4, 32):
        out = subprocess.run(
            [sys.executable, "-c", _MEASURE.format(repo=REPO), db.path,
             str(threads)],
            capture_output=True, text=True, timeout=600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(1)
        _, nk, total, best = line[0].split()
        assert int(nk) == k and int(total) == n, line
        best = float(best)
        print(
            f"arrow fold {threads:2d} threads: {best:5.2f}s = "
            f"{n/best/1e6:6.1f} M rec/s ({n/best/1e6/threads:5.1f} M/core)"
        )

    # in-process reference answer + warm Spark-plan equivalent
    rows = arrow_agg_series(db)
    best = None
    for _ in range(3):
        v = F.coalesce(
            F.try_element_at("v_double", F.lit(1)),
            F.try_element_at("v_long", F.lit(1)).cast("double"),
        )
        t0 = time.time()
        srows = (
            db.read()
            .select("key", v.alias("v"))
            .groupBy("key")
            .agg(
                F.count("v").alias("n"), F.sum("v").alias("sum"),
                F.min("v").alias("min"), F.max("v").alias("max"),
            )
            .orderBy("key")
            .collect()
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    assert [
        {"key": r["key"], "n": r["n"], "sum": r["sum"], "min": r["min"],
         "max": r["max"]}
        for r in srows
    ] == rows
    print(f"spark plan (warm):    {best:5.2f}s = {n/best/1e6:6.1f} M rec/s")


if __name__ == "__main__":
    main()
