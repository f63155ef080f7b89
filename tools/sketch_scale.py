#!/usr/bin/env python3
"""Measure sketch-vs-exact cost at scale: HLL distinct, CMS heavy
hitters, KMV overlap.

Usage: python tools/sketch_scale.py [n_rows] [n_distinct]
Defaults: 100M rows, 10M distinct values.

The exact baselines are the plans a sketch replaces at 100 TB:
- COUNT(DISTINCT v): shuffles every distinct value.
- top-k by frequency: full groupBy count + TakeOrdered.
- |A ∩ B| over two corpora: a distinct-join of both sides.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators import sketch
from sonnerie_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    spark = get_spark("sketch_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    vals = spark.range(n).select(
        F.concat(F.lit("u"), (F.col("id") % d)).alias("v")
    )

    # --- HLL vs exact distinct ---------------------------------------
    t0 = time.time()
    exact = vals.select(F.countDistinct("v")).collect()[0][0]
    t_exact = time.time() - t0

    t0 = time.time()
    sk = sketch.hll_sketch(vals, "v", bucket_bits=8)
    est = sketch.hll_estimate(sk, bucket_bits=8)
    t_hll = time.time() - t0
    err = abs(est - exact) / exact
    print(
        f"HLL: n={n:,} distinct={exact:,} | exact countDistinct "
        f"{t_exact:.1f}s | hll sketch+estimate {t_hll:.1f}s "
        f"({t_exact / t_hll:.1f}x) | est {est:,.0f} err {err:.2%}"
    )

    # --- CMS vs exact top-20 -----------------------------------------
    # heavy-hitter shape: ~27 geometric heavy values riding a long tail
    # of n_cms/2 DISTINCT singletons — the regime a CMS exists for (the
    # exact plan must shuffle the whole distinct domain; the sketch
    # shuffles <= depth*width counters per task)
    n_cms = n // 2
    heavy = spark.range(n_cms // 2).select(
        F.concat(
            F.lit("z"),
            F.floor(
                F.pow(F.lit(2.0), F.floor(F.log2(F.col("id") + 2)))
            ).cast("long"),
        ).alias("v")
    )
    tail = spark.range(n_cms // 2).select(
        F.concat(F.lit("t"), F.col("id")).alias("v")
    )
    zipf = heavy.unionByName(tail)
    t0 = time.time()
    exact_top = [
        (r["v"], r["c"])
        for r in zipf.groupBy("v")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "v")
        .limit(20)
        .collect()
    ]
    t_exact_top = time.time() - t0

    t0 = time.time()
    cms = sketch.cms_sketch(zipf, "v", depth=4, width=4096).cache()
    cms.count()
    t_cms_build = time.time() - t0
    # candidates from a 0.1% sample (any true heavy hitter appears in
    # a sample whp) — the standard candidates-from-sample CMS pattern;
    # probing the full 12.5M-distinct domain would re-pay the exact
    # plan's domain shuffle
    t0 = time.time()
    cand = zipf.sample(0.001, seed=7).select("v").distinct()
    cms_top = [
        (r["v"], r["est"])
        for r in sketch.cms_topk(cand, cms, k=20, depth=4, width=4096)
        .collect()
    ]
    t_cms_query = time.time() - t0
    hits = len({v for v, _ in exact_top} & {v for v, _ in cms_top})
    hits10 = len(
        {v for v, _ in exact_top[:10]} & {v for v, _ in cms_top[:10]}
    )
    floor = int(2.718 / 4096 * n_cms)  # CMS error bound eps*n = (e/w)*n
    print(
        f"CMS: n={n_cms:,} (~{n_cms // 2:,} distinct tail) | exact "
        f"top-20 {t_exact_top:.1f}s | sketch build {t_cms_build:.1f}s "
        f"+ sampled-candidate query {t_cms_query:.1f}s | top-10 overlap "
        f"{hits10}/10, top-20 {hits}/20 (noise floor eps*n~{floor:,}: "
        f"hitters below it are indistinguishable by design; widen w to "
        f"lower it)"
    )

    # --- KMV vs exact overlap ----------------------------------------
    half = n // 4
    a = spark.range(0, half).select(
        F.concat(F.lit("k"), F.col("id")).alias("v")
    )
    b = spark.range(half // 2, half + half // 2).select(
        F.concat(F.lit("k"), F.col("id")).alias("v")
    )
    t0 = time.time()
    inter_exact = (
        a.distinct().join(b.distinct(), "v", "left_semi").count()
    )
    union_exact = a.unionByName(b).distinct().count()
    t_exact_j = time.time() - t0
    true_j = inter_exact / union_exact

    t0 = time.time()
    ka = sketch.kmv_sketch(a, "v", k=1024)
    kb = sketch.kmv_sketch(b, "v", k=1024)
    row = sketch.kmv_overlap(ka, kb, k=1024).collect()[0]
    t_kmv = time.time() - t0
    est_j = row["jaccard_q"] / 1e6
    print(
        f"KMV: |A|=|B|={half:,} | exact jaccard {t_exact_j:.1f}s "
        f"(J={true_j:.3f}) | kmv {t_kmv:.1f}s ({t_exact_j / t_kmv:.1f}x) "
        f"| est {est_j:.3f} err {abs(est_j - true_j):.3f}"
    )

    # --- DDSketch vs exact percentiles --------------------------------
    # heavy-tailed positives: v = (id % 10007)^2 / 100 spans ~6 decades
    xs = spark.range(n).select(
        ((F.col("id") % 10007) * (F.col("id") % 10007) / 100.0 + 0.01)
        .alias("x")
    )
    t0 = time.time()
    ex = xs.select(
        F.expr("percentile(x, array(0.5, 0.99))").alias("p")
    ).collect()[0]["p"]
    t_exact_q = time.time() - t0

    t0 = time.time()
    dd = sketch.dd_sketch(xs, "x", relative_accuracy=0.01)
    est = {e["q"]: e["est"] for e in sketch.dd_quantiles(dd, [0.5, 0.99])}
    t_dd = time.time() - t0
    e50 = abs(est[0.5] - ex[0]) / ex[0]
    e99 = abs(est[0.99] - ex[1]) / ex[1]
    print(
        f"DD: n={n:,} | exact percentile(0.5,0.99) {t_exact_q:.1f}s | "
        f"dd sketch+walk {t_dd:.1f}s ({t_exact_q / t_dd:.1f}x) | "
        f"p50 err {e50:.2%} p99 err {e99:.2%} (bound 1% + rank step)"
    )

    # --- Bloom vs exact membership join --------------------------------
    # member set d/10 values; probe all n rows. The exact plan is a
    # distinct + broadcast (or shuffle, when the member set outgrows the
    # broadcast threshold) semi-join keyed on the VALUES; the bloom plan
    # broadcasts a fixed-size word table no matter the member count.
    mem = spark.range(0, d // 10).select(
        F.concat(F.lit("u"), F.col("id") * 10).alias("v")
    )
    t0 = time.time()
    exact_hits = vals.join(mem, "v", "left_semi").count()
    t_exact_b = time.time() - t0

    nb = 1 << 24  # 16 Mbit = ~266k packed words, 2 MiB broadcast
    t0 = time.time()
    bsk = sketch.bloom_sketch(mem, "v", num_bits=nb, num_hashes=4)
    probed = sketch.bloom_might_contain(
        vals, bsk, value="v", num_bits=nb, num_hashes=4
    )
    probed.write.format("noop").mode("overwrite").save()  # full probe, timed
    t_bloom = time.time() - t0
    bloom_hits = probed.filter("might_contain").count()  # fp stat, untimed
    fp = (bloom_hits - exact_hits) / max(1, n - exact_hits)
    print(
        f"BLOOM: n={n:,} members={d // 10:,} | exact semi-join "
        f"{t_exact_b:.1f}s ({exact_hits:,} hits) | bloom build+probe "
        f"{t_bloom:.1f}s ({bloom_hits:,} probable, fp {fp:.3%}; "
        f"word table {nb // 63:,} rows / {nb // 8 // 1024 // 1024} MiB "
        f"regardless of member count)"
    )


if __name__ == "__main__":
    main()
