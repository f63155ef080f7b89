#!/usr/bin/env python3
"""New-text-operator throughput at synthetic corpus scale.

Usage: python tools/substr_scale.py [n_docs] [tokens_per_doc]
Defaults: 1M docs x 50 tokens = 50M tokens; every 3rd document carries
a shared 11-token licence header (the ExactSubstr removal target), the
body is a crc-derived ~30k-type vocabulary.

Measures end-to-end (noop sink, full computation):
- dedup_substrings (k=8): span-hash stream (n_docs x ~43 spans), one
  distinct+count shuffle, per-doc flagged arrays, map-side edit
- gopher_quality / c4_clean: the map-only published filters (the
  scan-speed claim, measured)
- bpe_encode (8 merges): the replace-chain encoder (interspersing
  triples string volume; this prices that constant)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators import text as textops
from sonnerie_spark.session import get_spark

HEADER = "this work is licensed under the creative commons attribution license terms"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tpd = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_tokens = n_docs * tpd
    spark = get_spark("substr_scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(tpd)),
            lambda p: F.concat(
                F.lit("w"),
                F.pmod(
                    F.crc32(
                        F.concat(
                            F.col("id").cast("string"),
                            F.lit("#"),
                            p.cast("string"),
                        )
                    ),
                    F.lit(30_000),
                ),
            ),
        ),
        " ",
    )
    docs = spark.range(n_docs).select(
        "id",
        F.when(
            F.col("id") % 3 == 0, F.concat(F.lit(HEADER + " "), body)
        ).otherwise(body).alias("text"),
    ).persist()
    docs.count()

    def run(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{name}: {dt:.1f}s = {n_tokens / dt / 1e6:.1f}M tok/s")
        # operators that persist intermediates (dedup_substrings' span
        # stream) must not bleed cache pressure into the next row
        spark.catalog.clearCache()
        docs.persist(); docs.count()
        return dt

    run("dedup_substrings k=8",
        textops.dedup_substrings(docs, "id", "text", k=8, min_df=2))
    removed = (
        textops.dedup_substrings(docs, "id", "text", k=8, min_df=2)
        .agg(F.sum("n_removed")).collect()[0][0]
    )
    # the header is 11 whitespace tokens; with k=8 the spans fully
    # inside it flag positions 0..3, covering exactly those 11 tokens
    # per header doc (boundary spans cross into the doc-unique body and
    # are never corpus-frequent)
    exp_min = -(-n_docs // 3) * 11
    print(f"  tokens removed: {removed:,} (injected headers contribute "
          f">= {exp_min:,}; rest is natural span repetition)")
    run("gopher_quality", textops.gopher_quality(docs, "id", "text"))
    run("c4_clean", textops.c4_clean(docs, "id", "text"))
    run("bpe_encode 8 merges",
        textops.bpe_encode(docs, "id", "text", [
            ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
            ("an", "d"), ("e", "r"), ("o", "u"), ("c", "o"),
        ]))

    qdf = docs.limit(16).select(
        F.col("id").alias("q_id"),
        F.concat(F.lit("w0 w1 "), F.substring("text", 1, 30)).alias("q_text"),
    )
    run("bm25_topk 16 queries",
        textops.bm25_topk(docs, qdf, id_col="id", top_k=10))

    from sonnerie_spark.operators.sampling import budget_mix

    src = docs.select(
        "id", "text",
        F.concat(F.lit("s"), F.pmod("id", F.lit(8))).alias("source"),
        F.lit(tpd).alias("n_tokens"),
    )
    run("budget_mix 8 sources", budget_mix(
        src, "source", "id", "n_tokens",
        budget=n_tokens // 3, weights={f"s{i}": i + 1 for i in range(8)},
    ))


if __name__ == "__main__":
    main()
