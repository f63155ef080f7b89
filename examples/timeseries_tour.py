#!/usr/bin/env python3
"""A tour of the reference-parity surface: everything a sonnerie user
does today, on this engine — create a database, ingest transactions,
wildcard/range reads, last-writer-wins overwrites, deletes, time
travel, change capture, continuous rollups with a cascade, compaction,
and the per-series fold.

Usage: python examples/timeseries_tour.py [workdir]
Runs in a temp dir by default; prints each step's observable result.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sonnerie_spark import Database, get_spark
from sonnerie_spark.streaming.rollup import ContinuousRollup

NS = 10**9
HOUR = 3600 * NS


def main(workdir: str | None = None) -> None:
    spark = get_spark("timeseries_tour", shuffle_partitions=8)
    base = workdir or tempfile.mkdtemp(prefix="snk_tour_")
    db = Database(spark, os.path.join(base, "db"))

    # 1. Ingest: two transactions of (key, ts, fmt, values) records.
    tx = db.create_tx()
    for hour in range(24):
        for sensor in ("temp.paris", "temp.tokyo", "rain.paris"):
            tx.add_record(sensor, hour * HOUR, "F", [20.0 + hour % 7])
    tx1 = tx.commit()
    tx = db.create_tx()
    tx.add_record("temp.oslo", 0, "F", [3.0])
    tx2 = tx.commit()
    print(f"1 ingest: 2 transactions ({tx1}, {tx2}), "
          f"{db.read().count()} records")

    # 2. Reads: wildcard, key range, time range — all pushed to parquet.
    n_paris = db.read(wildcard="%.paris").count()
    n_temp = db.read(after_key="temp", before_key="tempzz").count()
    n_early = db.read(before_ns=6 * HOUR).count()
    print(f"2 reads: %.paris={n_paris}  temp-range={n_temp}  "
          f"first-6h={n_early}")

    # 3. Last-writer-wins: overwrite one point; reads see ONE record.
    tx = db.create_tx()
    tx.add_record("temp.paris", 0, "F", [99.9])
    tx.commit()
    rows = db.get("temp.paris", before_ns=HOUR)
    print(f"3 LWW overwrite: temp.paris@0h -> {rows[0]['v_double'][0]} "
          f"({len(rows)} record for the slot)")

    # 4. Time travel + CDC: the pre-overwrite snapshot still reads 20.0.
    old = [r for r in
           Database(spark, db.path).read(as_of=tx2, key="temp.paris")
           .filter("ts = 0").collect()]
    delta = db.changes(since=tx2).count()
    print(f"4 time travel: as_of tx2 reads {old[0]['v_double'][0]}; "
          f"changes since tx2 = {delta} rows")

    # 5. Delete: drop the tokyo series; marker only, no rewrite.
    db.commit_deletes([{"wildcard": "temp.tokyo"}])
    print(f"5 delete: temp.tokyo reads {db.read(key='temp.tokyo').count()} "
          f"rows (marker tx, no data rewrite)")

    # 6. Continuous rollup 1h -> 6h cascade: refresh reads only the tail.
    r1 = ContinuousRollup(db, os.path.join(base, "rollup_1h"),
                          interval_ns=HOUR)
    r1.refresh()
    r6 = ContinuousRollup.cascade(r1, os.path.join(base, "rollup_6h"),
                                  interval_ns=6 * HOUR)
    r6.refresh()
    print(f"6 rollups: 1h buckets={r1.dst.read().count()}  "
          f"6h buckets={r6.dst.read().count()} (cascade reads the 1h "
          f"rollup, never the raw data)")

    # 7. Compaction: merge runs + apply markers; reads stay identical.
    before = db.read().count()
    db.compact(major=True)
    after = db.read().count()
    runs = len(db.data_runs())
    print(f"7 major compaction: {before} -> {after} rows, {runs} run "
          f"(markers purged, layout bucketed)")

    # 8. Per-series fold (the reference's per-core aggregation): on the
    # compacted steady state this is a driver-side Arrow scan, no Spark.
    folds = db.agg_series(wildcard="temp.%")
    for f in folds:
        print(f"8 fold {f['key']}: n={f['n']} min={f['min']:.1f} "
              f"max={f['max']:.1f} mean={f['sum']/f['n']:.2f}")

    # 9. Per-key p99 via grouped DDSketch over the merged view — the
    # "p99 per service" question answered from a mergeable few-row
    # integer sketch instead of a full sort (sketch.dd_sketch_grouped).
    from pyspark.sql import functions as F

    from sonnerie_spark.operators import sketch as sk

    v = F.coalesce(
        F.try_element_at("v_double", F.lit(1)),
        F.try_element_at("v_long", F.lit(1)).cast("double"),
    )
    dd = sk.dd_sketch_grouped(db.read().select("key", v.alias("v")), "key", "v")
    for r in sorted(
        sk.dd_group_quantile(dd, 0.99).collect(), key=lambda r: r["grp"]
    ):
        print(f"9 p99[{r['grp']}] ~= {r['est']:.1f} "
              f"(bucket {r['bucket']}, rel err <= 1%)")


if __name__ == "__main__":
    main()
