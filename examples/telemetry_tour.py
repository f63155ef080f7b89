#!/usr/bin/env python3
"""Sketch/telemetry tour — the approximate-analytics surface that keeps
100 TB queries bounded, each step printing its observable result:

  1. hll_sketch / hll_estimate      distinct users without the
                                    COUNT(DISTINCT) shuffle
  2. hll_merge                      day-1 + day-2 sketches == one-shot
  3. cms_sketch / cms_topk          heavy hitters from eps*n counters
  4. cms_merge                      additive counter merge == one-shot
  5. kmv_sketch / kmv_overlap       cross-corpus Jaccard from bottom-k
  6. kmv_merge                      bottom-k closed under merge
  7. dd_sketch / dd_quantiles       p50/p99 within 1% relative error
  8. dd_sketch_grouped +            per-key p99, extracted distributed
     dd_group_quantile
  9. dd_merge                       grouped bucket tables sum-merge
 10. HllStore / DdStore             persistent stores: idempotent /
                                    exactly-once incremental adds
 11. bloom_sketch +                 fixed-size membership, map-only
     bloom_might_contain            probe; no false negatives

Usage: python examples/telemetry_tour.py [sf_dir]
Defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators import sketch
from sonnerie_spark.session import get_spark
from sonnerie_spark.sources.testdata import load


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("telemetry_tour", shuffle_partitions=4)
    ev = load(spark, sf_dir, "events")
    user = F.col("user_id").cast("string")
    even = ev.filter(F.col("event_id") % 2 == 0)
    odd = ev.filter(F.col("event_id") % 2 == 1)

    # 1-2: HLL distinct + merge identity
    exact = ev.select(F.countDistinct(user)).collect()[0][0]
    sk = sketch.hll_sketch(ev, user)
    est = sketch.hll_estimate(sk)
    merged = sketch.hll_merge(
        sketch.hll_sketch(even, user), sketch.hll_sketch(odd, user)
    )
    same = sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )
    print(f"[1] HLL distinct users: est {est:.0f} vs exact {exact} "
          f"({abs(est - exact) / exact:.1%} err)")
    print(f"[2] hll_merge(even, odd) == one-shot sketch: {same}")

    # 3-4: CMS heavy hitters + merge
    cms = sketch.cms_sketch(ev, F.col("event_type"))
    cand = ev.select(F.col("event_type").alias("v")).distinct()
    top = sketch.cms_topk(cand, cms, k=3).collect()
    cm = sketch.cms_merge(
        sketch.cms_sketch(even, F.col("event_type")),
        sketch.cms_sketch(odd, F.col("event_type")),
    )
    same = sorted(map(tuple, cm.collect())) == sorted(map(tuple, cms.collect()))
    print(f"[3] CMS top event types: {[(r['v'], r['est']) for r in top]}")
    print(f"[4] cms_merge(even, odd) == one-shot sketch: {same}")

    # 5-6: KMV overlap + merge
    a = ev.filter("value >= 0").select(user.alias("v"))
    b = ev.filter("value < 1").select(user.alias("v"))
    ka, kb = sketch.kmv_sketch(a, "v", k=64), sketch.kmv_sketch(b, "v", k=64)
    row = sketch.kmv_overlap(ka, kb, k=64).collect()[0]
    km = sketch.kmv_merge(ka, kb, k=64)
    one = sketch.kmv_sketch(a.unionByName(b), "v", k=64)
    same = sorted(r["h"] for r in km.collect()) == sorted(
        r["h"] for r in one.collect()
    )
    print(f"[5] KMV jaccard(value>=0, value<1) ~ {row['jaccard_q'] / 1e6:.3f}")
    print(f"[6] kmv_merge == one-shot bottom-k: {same}")

    # 7-9: DDSketch quantiles, grouped, merge
    dd = sketch.dd_sketch(ev, "value")
    qs = sketch.dd_quantiles(dd, [0.5, 0.99])
    print(f"[7] DD p50 {qs[0]['est']:.3f}  p99 {qs[1]['est']:.3f} "
          f"(1% relative-error buckets)")
    g = sketch.dd_sketch_grouped(ev, "event_type", "value")
    gq = sketch.dd_group_quantile(g, 0.99).orderBy("grp").collect()
    print(f"[8] per-type p99: {[(r['grp'], round(r['est'], 2)) for r in gq[:4]]}")
    gm = sketch.dd_merge(
        sketch.dd_sketch_grouped(even, "event_type", "value"),
        sketch.dd_sketch_grouped(odd, "event_type", "value"),
    )
    same = sorted(map(tuple, gm.collect())) == sorted(map(tuple, g.collect()))
    print(f"[9] grouped dd_merge(even, odd) == one-shot: {same}")

    # 10: persistent stores (in a cleaned-up tempdir — every tour and
    # pytest run would otherwise leak two parquet store generations)
    with tempfile.TemporaryDirectory(prefix="telemetry_tour_") as root:
        hs = sketch.HllStore(spark, os.path.join(root, "hll"))
        hs.add(even, F.col("event_type"), user)
        hs.add(odd, F.col("event_type"), user)
        hs.add(odd, F.col("event_type"), user)  # replay: max-merge idempotent
        ests = hs.estimates().orderBy("grp").collect()
        ds = sketch.DdStore(spark, os.path.join(root, "dd"))
        applied = [ds.add(0, even, "event_type", "value"),
                   ds.add(1, odd, "event_type", "value"),
                   ds.add(1, odd, "event_type", "value")]  # replay no-op
        print(f"[10] HllStore per-type distinct (replay-safe): "
              f"{[(r['grp'], round(r['est'])) for r in ests[:3]]}; "
              f"DdStore adds applied={applied} (third is the replayed no-op)")

    # 11: bloom membership
    mem = ev.filter(F.col("user_id") % 5 == 0).select(user.alias("v"))
    bf = sketch.bloom_sketch(mem, "v", num_bits=4096)
    probed = sketch.bloom_might_contain(
        ev.select(F.col("user_id").alias("uid"), user.alias("v")),
        bf, value="v", num_bits=4096,
    )
    fn = probed.filter((F.col("uid") % 5 == 0) & ~F.col("might_contain")).count()
    fp = probed.filter((F.col("uid") % 5 != 0) & F.col("might_contain")).count()
    n = probed.count()
    print(f"[11] Bloom membership over {n} events: false negatives {fn} "
          f"(always 0), false positives {fp} (fill-factor bound)")
    assert fn == 0


if __name__ == "__main__":
    main()
