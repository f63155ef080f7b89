#!/usr/bin/env python3
"""LM-scoring and DSIR throughput at synthetic corpus scale.

Usage: python tools/lm_scale.py [n_docs] [tokens_per_doc]
Defaults: 2M docs x 50 tokens = 100M tokens, ~30k-type vocabulary with
a zipf-ish skew (token index = id*pos hash mod a power curve).

Measures: bigram-LM training on a 10% reference slice, scoring the full
corpus, and DSIR weighting of the full corpus against that slice — the
three passes a CCNet-style curation pipeline pays per corpus refresh.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators import lm
from sonnerie_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    tpd = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_tokens = n_docs * tpd
    spark = get_spark("lm_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    # zipf-ish synthetic text: token type = crc32(id,pos) squashed by a
    # square so low indices dominate; ~30k types at these defaults
    docs = spark.range(n_docs).select(
        F.col("id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(tpd)),
                lambda p: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.pow(
                            F.pmod(
                                F.crc32(
                                    F.concat(
                                        F.col("id").cast("string"),
                                        F.lit("#"),
                                        p.cast("string"),
                                    )
                                ),
                                F.lit(100_000),
                            ).cast("double")
                            / 100_000.0
                            * 173.2,
                            F.lit(2.0),
                        ).cast("long"),
                        F.lit(30_000),
                    ),
                ),
            ),
            " ",
        ).alias("text"),
    ).persist()
    docs.count()

    ref = docs.filter(F.col("id") % 10 == 0)

    t0 = time.time()
    vocab, uni, bi, v_eff = lm.lm_bigram_counts(ref, "text", vocab_size=8192)
    bi = bi.persist()
    n_bi = bi.count()
    t_train = time.time() - t0

    t0 = time.time()
    scored = lm.lm_doc_score(
        docs, "id", "text", vocab=vocab, uni=uni, bi=bi, v_eff=v_eff
    )
    n_scored = scored.count()
    t_score = time.time() - t0

    t0 = time.time()
    w = lm.dsir_doc_weights(docs, "id", "text", target=ref, num_buckets=1024)
    n_w = w.count()
    t_dsir = time.time() - t0

    print(
        f"LM: {n_docs:,} docs x {tpd} tok = {n_tokens/1e6:.0f}M tokens | "
        f"train (10% slice, V=8192, {n_bi:,} bigram types) {t_train:.1f}s | "
        f"score all docs {t_score:.1f}s = "
        f"{n_tokens / t_score / 1e6:.1f}M tok/s ({n_scored:,} docs) | "
        f"DSIR weights {t_dsir:.1f}s = {n_tokens / t_dsir / 1e6:.1f}M tok/s "
        f"({n_w:,} docs)"
    )


if __name__ == "__main__":
    main()
