#!/usr/bin/env python3
"""Profile one registry query: where does its wall time go?

Usage: python tools/profile_query.py NAME [NAME...]

Runs each named query exactly like bench.py (warm-up + timed noop
write) with the Spark event log enabled, then replays the event log and
prints, per job: submit gap (driver think-time since the previous job
finished — spill writes, collects, planning), run time, stage count,
task-time sum. This separates the three costs that look identical in a
bench number: executor compute, shuffle, and sequential driver barriers.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="sg-evlog-")

    os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
        {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    )

    from sonnerie_spark.benchqueries import REGISTRY
    from sonnerie_spark.session import get_spark

    spark = get_spark("profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    defs = {d.name: d for d in REGISTRY}
    for name in names:
        d = defs[name]
        # warm-up
        d.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _release(spark)
        spark.sparkContext._jvm.System.gc()
        marker = f"PROFILE:{name}"
        spark.sparkContext.setJobDescription(marker)
        t0 = time.time()
        d.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        _release(spark)
        print(f"\n=== {name}: timed wall {wall:.3f}s ===")
        _report(evdir, marker)


def _release(spark) -> None:
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)


def _report(evdir: str, marker: str) -> None:
    # newest event log file
    logs = sorted(
        (os.path.join(evdir, f) for f in os.listdir(evdir) if not f.startswith(".")),
        key=os.path.getmtime,
    )
    path = logs[-1]
    if os.path.isdir(path):  # rolling event-log layout (eventlog_v2_*)
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_") or "appstatus" not in f
        )
        lines = []
        for p in parts:
            if os.path.isfile(p):
                with open(p) as f:
                    lines.extend(f.readlines())
    else:
        with open(path) as f:
            lines = f.readlines()
    jobs = {}
    stages = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description", "")
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "end": None,
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                # Physical-operator attribution: the callsite in "Stage
                # Name" is an opaque AQE lambda; the RDD scopes carry the
                # actual plan-node names (Scan parquet, Exchange,
                # WholeStageCodegen, ArrowEvalPython ...).
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except json.JSONDecodeError:
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "name": ">".join(reversed(scopes))[:90]
                    or si["Stage Name"].split("\n")[0],
                    "tasks": si["Number of Tasks"],
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                }
    sel = sorted(
        (j for j in jobs.values() if marker in j["desc"] and j["end"]),
        key=lambda j: j["start"],
    )
    if not sel:
        print("  (no jobs captured — marker not found in event log)")
        return
    prev_end = None
    total_gap = total_run = 0.0
    for i, j in enumerate(sel):
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        run = (j["end"] - j["start"]) / 1000.0
        prev_end = j["end"]
        total_gap += max(gap, 0)
        total_run += run
        st = [stages[s] for s in j["stages"] if s in stages]
        stdesc = ", ".join(f"{s['tasks']}t:{s['name']}" for s in st)
        print(f"  job{i:3d} gap {gap:6.3f}s run {run:6.3f}s  [{stdesc[:120]}]")
    print(f"  jobs={len(sel)} driver-gap total {total_gap:.3f}s  job-run total {total_run:.3f}s")


if __name__ == "__main__":
    main()
