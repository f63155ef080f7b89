#!/usr/bin/env python3
"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect), timed after a session warm-up so JVM/codegen startup is
not attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sonnerie_spark.benchqueries import REGISTRY
from sonnerie_spark.session import get_spark


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up JVM

    # One untimed warm-up execution per query, then the timed run.
    # First execution of a plan pays one-time JVM costs (codegen + JIT
    # compilation of the generated methods, Python worker spin-up) that
    # are 10-100x the steady-state cost on this tiny data and amortize
    # to nothing at production scale; warm timings are the meaningful
    # per-operator number.
    # Force a JVM GC between queries: Spark's ContextCleaner reclaims
    # shuffle/broadcast state only when the JVM collects the references,
    # and on a 35-query session the accumulated state otherwise degrades
    # join-heavy queries by 10-30x (measured). On a real cluster the
    # per-job executors don't share one long-lived driver heap like
    # local mode does.
    jvm_gc = spark.sparkContext._jvm.System.gc
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for d in REGISTRY:
        if d.gate_only:
            # write-path roundtrips: correctness-gate only; ingest
            # throughput is measured by tools/scale_smoke.py (SCALE.md)
            continue
        # Per-query isolation: one failing query must never zero the
        # whole bench file (BENCH_r03 lesson) — record the error, move on.
        try:
            t0 = time.time()
            d.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.time() - t0
            # min of 2 timed runs guards JIT flukes on fast queries; for
            # heavy ones (iterative CC, composite pipelines) the warm-up
            # execution above already absorbed JIT, and a second timed
            # repeat only inflates wall time — one timed run suffices.
            reps = 1 if warm > 2.0 else 2
            best = float("inf")
            for _ in range(reps):
                jvm_gc()
                t0 = time.time()
                d.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            timings[d.name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 - isolation is the point
            errors[d.name] = f"{type(e).__name__}: {e}"[:500]
            print(f"bench: {d.name} FAILED: {errors[d.name]}", file=sys.stderr)
        # Evict persisted frames between queries: operators that persist
        # intermediates (simhash signatures, LSH bands) would otherwise
        # accumulate cache across the ~80-query session and inflate
        # later queries' timings (the r4 outlier investigation traced
        # the 2-3x late-session drift to exactly this).
        spark.catalog.clearCache()
        jvm_gc()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "registry_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(sf_dir),
    }
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    print(line)
    # One authoritative artifact per run: write the same JSON atomically
    # next to the repo so docs (COVERAGE.md) cite a committed file, not
    # a number remembered from a different run.
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    tmp = dest + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, dest)


if __name__ == "__main__":
    main()
