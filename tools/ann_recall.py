#!/usr/bin/env python3
"""Measure recall@k of every ANN path against the exact cosine truth.

The approximate paths trade recall for the 100 TB scan shape (IVF list
pruning, PQ byte codes); this tool puts NUMBERS on that trade at the
bench scale factor so the design choice is measured, not asserted.

- ivf nprobe=1/2/4 of 8 lists (exact ranking inside probed lists)
- flat PQ ADC (m=4 x ksub=16): seed codebooks vs 2-iter trained
- IVF+PQ (nprobe=2): both prunings composed

Recall@k = |approx top-k ∩ exact top-k| / k, averaged over probes.
PQ ranks by scaled-int L2 on unnormalized vectors while the truth is
cosine — part of the measured gap is metric mismatch, which trained
codebooks recover only partially.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_probes]
Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators.similarity import (
    cosine_topk,
    ivf_pq_topk,
    ivf_topk,
    pq_adc_topk,
    pq_codebook_data,
    pq_train,
)
from sonnerie_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
N_PROBES = int(sys.argv[3]) if len(sys.argv) > 3 else 50


def topset(rows):
    out = {}
    for r in rows:
        pid = r.probe_id
        cid = r.cand_id if hasattr(r, "cand_id") else r.id
        out.setdefault(pid, set()).add(cid)
    return out


def recall(approx, truth):
    vals = [
        len(approx.get(p, set()) & t) / len(t) for p, t in truth.items()
    ]
    return round(sum(vals) / len(vals), 4)


def main():
    spark = get_spark("ann_recall")
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        .cache()
    )
    n = emb.count()
    probes = emb.filter(F.col("vec_id") < N_PROBES).cache()

    truth = topset(cosine_topk(emb, probes, k=K).collect())

    def run(name, df, extra=None):
        t0 = time.time()
        r = recall(topset(df.collect()), truth)
        rec = {
            "config": name,
            "recall_at_k": r,
            "k": K,
            "n_probes": N_PROBES,
            "corpus": n,
            "sec": round(time.time() - t0, 2),
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    for nprobe in (1, 2, 4, 8):
        run(
            f"ivf_nprobe{nprobe}",
            ivf_topk(emb, probes, num_centroids=8, nprobe=nprobe, k=K),
        )

    seed = pq_codebook_data(emb, m=4, ksub=16)
    run("pq_adc_seed_m4", pq_adc_topk(emb, probes, codebooks=seed, k=K))
    trained = pq_train(emb, m=4, ksub=16, iters=2)
    run("pq_adc_trained2_m4", pq_adc_topk(emb, probes, codebooks=trained, k=K))
    run(
        "ivfpq_nprobe2_trained2_m4",
        ivf_pq_topk(
            emb, probes, num_centroids=8, nprobe=2, codebooks=trained, k=K
        ),
    )

    # L2-normalized input makes PQ's L2 ranking cosine-equivalent
    # (cos(a,b) = 1 - ||a^ - b^||^2 / 2, monotone), and finer subspaces
    # (m=16 -> 4 dims per subquantizer) cut quantization error — the two
    # production knobs for recall, each costing nothing at query time
    # beyond a bigger (m x ksub) table
    from sonnerie_spark.operators.similarity import l2_norm

    nemb = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: x / l2_norm(F.col("embedding"))
        ).alias("embedding"),
    ).cache()
    nprobes = nemb.filter(F.col("vec_id") < N_PROBES)
    for m, ksub in ((8, 16), (16, 16), (16, 64)):
        tb = pq_train(nemb, m=m, ksub=ksub, iters=2)
        run(
            f"pq_adc_trained2_m{m}k{ksub}_normalized",
            pq_adc_topk(nemb, nprobes, codebooks=tb, k=K),
        )
    spark.stop()


if __name__ == "__main__":
    main()
