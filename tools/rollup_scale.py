#!/usr/bin/env python3
"""Continuous-rollup scale anchor: incremental refresh cost vs full
rebuild at N source records.

Scenario (the steady state a continuous aggregate exists for): a 20 M
record database with an hourly rollup already built; a new transaction
lands touching 0.1% of the data; measure refresh() (dirty-bucket
recompute + LWW upsert) against refresh_full() (one-shot rebuild).

Usage: python tools/rollup_scale.py [n_records]
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
from sonnerie_spark.streaming.rollup import ContinuousRollup

HOUR = 3600 * 10**9


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    base = tempfile.mkdtemp(prefix="rollup_scale_")
    spark = get_spark("rollup_scale")
    try:
        n_keys = 10_000
        # each key: one record per 6 minutes -> 10 records per hour-bucket
        gen = spark.range(n).select(
            F.concat(
                F.lit("key"),
                F.lpad((F.col("id") % n_keys).cast("string"), 6, "0"),
            ).alias("key"),
            ((F.col("id") / n_keys).cast("long") * (HOUR // 10)).alias("ts"),
            F.lit("u").alias("fmt"),
            F.array(F.pmod(F.xxhash64("id"), F.lit(1000))).alias("v_long"),
            F.lit(None).cast("array<double>").alias("v_double"),
            F.lit(None).cast("array<string>").alias("v_str"),
            F.lit(None).cast("array<binary>").alias("v_bin"),
        )
        src = Database(spark, os.path.join(base, "src"))
        src.commit_dataframe(gen, check_duplicates=False)

        roll = ContinuousRollup(src, os.path.join(base, "roll"), interval_ns=HOUR)
        t0 = time.time()
        roll.refresh()  # initial full build through the incremental path
        t_build = time.time() - t0
        n_buckets = roll.read().count()
        print(
            f"initial build: {n} records -> {n_buckets} buckets "
            f"in {t_build:.1f}s = {n / t_build / 1e6:.1f} M rec/s"
        )

        # new tx: 0.1% of records, overwriting existing (key, ts) slots
        m = n // 1000
        upd = gen.filter(F.pmod(F.xxhash64(F.col("key")), F.lit(1000)) == 0).limit(m)
        src.commit_dataframe(upd, check_duplicates=False)
        t0 = time.time()
        roll.refresh()
        t_inc = time.time() - t0
        t0 = time.time()
        roll.refresh_full()
        t_full = time.time() - t0
        print(
            f"after a {m}-record tx: incremental refresh {t_inc:.1f}s, "
            f"full rebuild {t_full:.1f}s, speedup {t_full / t_inc:.1f}x"
        )

        # multi-column rollup cost: the same refresh with num_values=4
        # ("FFFF" records) — per-column stats ride ONE hash aggregation
        # (4m buffers), so the wall time should track m=1, not 4x it.
        gen4 = gen.select(
            "key", "ts", F.lit("FFFF").alias("fmt"),
            F.lit(None).cast("array<long>").alias("v_long"),
            F.array(
                *[
                    F.pmod(F.xxhash64("key") + F.lit(j), F.lit(1000)).cast(
                        "double"
                    )
                    for j in range(4)
                ]
            ).alias("v_double"),
            F.col("v_str"), F.col("v_bin"),
        )
        src4 = Database(spark, os.path.join(base, "src4"))
        src4.commit_dataframe(gen4, check_duplicates=False)
        roll4 = ContinuousRollup(
            src4, os.path.join(base, "roll4"), interval_ns=HOUR, num_values=4
        )
        roll4.refresh()
        src4.commit_dataframe(
            gen4.filter(
                F.pmod(F.xxhash64(F.col("key")), F.lit(1000)) == 0
            ).limit(m),
            check_duplicates=False,
        )
        t0 = time.time()
        roll4.refresh()
        t_inc4 = time.time() - t0
        print(
            f"num_values=4 incremental refresh of the same-size tx: "
            f"{t_inc4:.1f}s ({t_inc4 / t_inc:.2f}x the single-column cost)"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
