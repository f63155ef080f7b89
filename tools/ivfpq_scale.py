#!/usr/bin/env python3
"""Measure what the PQ codes buy at rest and at query time.

Builds the full-vector IvfIndex and the code-only IvfPqIndex over the
same N synthetic 64-dim vectors (seeded rand, clustered around C
anchors so the inverted lists are meaningful) and compares:
  - on-disk index size (the 100 TB story: codes are ~(8*dim)/m smaller)
  - warm query latency at nprobe=2 (exact-cosine-in-list vs ADC)
  - build/add cost

Usage: python tools/ivfpq_scale.py [n_vectors] [dim] [m]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators.similarity import IvfIndex, IvfPqIndex
from sonnerie_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
M = int(sys.argv[3]) if len(sys.argv) > 3 else 4
C = 8


def du(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    spark = get_spark("ivfpq_scale")
    # clustered synthetic corpus: anchor = seeded rand per (cluster, dim),
    # vector = anchor + small seeded jitter — deterministic enough for a
    # perf probe, and the C clusters make the inverted lists non-trivial
    base = spark.range(N).withColumn("cl", (F.col("id") % C).cast("int"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            F.sin(F.col("cl") * 131.0 + d * 17.0)
            + F.sin(F.col("id") * 0.37 + d * 3.0) * 0.1
        ),
    )
    emb = base.select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).persist()
    n = emb.count()
    probes = emb.filter(F.col("vec_id") < 20).persist()
    probes.count()

    root = tempfile.mkdtemp(prefix="ivfpq_scale_")
    out = {"n": n, "dim": DIM, "m": M, "centroids": C}

    t0 = time.time()
    ivf = IvfIndex(spark, os.path.join(root, "ivf"))
    ivf.build(emb, num_centroids=C, iters=1)
    out["ivf_build_s"] = round(time.time() - t0, 2)
    out["ivf_bytes"] = du(os.path.join(root, "ivf"))

    t0 = time.time()
    pq = IvfPqIndex(spark, os.path.join(root, "ivfpq"))
    pq.build(emb, num_centroids=C, iters=1, pq_m=M, pq_iters=1)
    out["ivfpq_build_s"] = round(time.time() - t0, 2)
    out["ivfpq_bytes"] = du(os.path.join(root, "ivfpq"))
    out["size_ratio"] = round(out["ivf_bytes"] / out["ivfpq_bytes"], 2)

    # warm each path once, then time
    ivf.topk(probes, nprobe=2, k=10).count()
    t0 = time.time()
    ivf.topk(probes, nprobe=2, k=10).count()
    out["ivf_query_s"] = round(time.time() - t0, 2)

    pq.topk(probes, nprobe=2, k=10).count()
    t0 = time.time()
    pq.topk(probes, nprobe=2, k=10).count()
    out["ivfpq_query_s"] = round(time.time() - t0, 2)

    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
