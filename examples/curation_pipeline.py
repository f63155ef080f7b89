#!/usr/bin/env python3
"""End-to-end training-data curation over the test corpus — every stage
is one of the engine's oracle-gated operators, composed the way the
published pipelines (C4, Gopher, CCNet, RefinedWeb, SemDeDup, Lee et
al. ExactSubstr) chain them:

  0. decontaminate_bloom strip eval-set material first (fixed-size
                        Bloom filter of the benchmark's 8-gram
                        shingles; no false negatives)
  1. gopher_quality     document-level rule filter (Rae et al. 2021)
  2. c4_clean           line-level cleaning (Raffel et al. 2020)
  3. normalize_text     NFC + control strip + whitespace collapse
  4. exact dedup        first-occurrence by content hash
  5. dedup_substrings   ExactSubstr span removal (Lee et al. 2021)
  6. MinHash-LSH + CC   near-dup clusters -> keep longest per cluster
  7. semdedup           embedding-space near-dup drop (Abbas et al. 2023)
  8. budget_mix         token-budget mixture across sources
  9. hash_split         stable train/valid/test
 10. pack_sequences     fixed-length example packing
 11. bpe_train+encode   train a BPE tokenizer on the curated split,
                        then tokenize with it (Sennrich et al. 2016)

Usage: python examples/curation_pipeline.py [sf_dir]
Defaults to /root/testdata/sf0.001. Prints per-stage document/token
counts so the funnel is visible.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sonnerie_spark.operators import dedup, graph, sampling, similarity
from sonnerie_spark.operators import text as textops
from sonnerie_spark.operators.text import tokens
from sonnerie_spark.session import get_spark
from sonnerie_spark.sources.testdata import load


def stage(name, df, tokens_col=None):
    # CUT LINEAGE at every stage boundary: stages reference their input
    # on both sides of joins/anti-joins, so without truncation the
    # composed plan tree doubles per stage (exponential — the 8-stage
    # plan string passes 1 GB and OOMs the JVM before any data moves),
    # and every count() would re-run the whole upstream pipeline.
    # localCheckpoint materializes the stage once and keeps the data in
    # executor memory (same lesson as operators/graph.py's CC rounds).
    df = df.localCheckpoint(eager=True)
    n = df.count()
    if tokens_col:
        t = df.agg(F.sum(tokens_col)).collect()[0][0]
        print(f"{name:<28} {n:>7,} docs  {t:>10,} tokens")
    else:
        print(f"{name:<28} {n:>7,} docs")
    return df


def main(sf_dir: str | None = None) -> None:
    if sf_dir is None:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation_example", shuffle_partitions=8)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    docs = stage("raw corpus", docs)

    # 0. Decontamination FIRST (the published pipeline order): drop any
    # document sharing a probable 8-gram with the pseudo-eval set
    # (doc_id % 97). The Bloom filter is fixed-size no matter how big
    # the eval side grows; false positives only ever over-remove.
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = textops.decontaminate_bloom(
        docs, bench, k=8, num_bits=1 << 16, num_hashes=4
    ).select("id")
    docs = docs.join(
        flagged, docs["doc_id"] == flagged["id"], "left_anti"
    )
    docs = stage("0 decontaminate_bloom", docs)

    # 1. Gopher rules: keep docs passing every published rule except the
    # stopword floor (the synthetic corpus has few English stopwords, so
    # min_stop_hits=1 keeps the funnel non-empty while still exercising
    # the other six rules).
    gq = textops.gopher_quality(docs, "doc_id", "text", min_stop_hits=1)
    kept = docs.join(
        gq.filter(F.col("keep")).select(F.col("id").alias("doc_id")), "doc_id"
    )
    kept = stage("1 gopher_quality", kept)

    # 2. C4 line rules need multi-line pages with terminal punctuation;
    # sentence-ify the single-line corpus the way a web extractor would.
    paged = kept.withColumn(
        "text",
        F.concat(F.regexp_replace("text", r"((\S+\s+){9}\S+)\s+", "$1.\n"),
                 F.lit(".")),
    )
    c4 = textops.c4_clean(paged, "doc_id", "text", min_kept_lines=1)
    cleaned = (
        paged.drop("text")
        .join(c4.filter("keep").select(F.col("id").alias("doc_id"), "text"),
              "doc_id")
    )
    cleaned = stage("2 c4_clean", cleaned)

    # 3. Unicode normalization (idempotent; map-only).
    norm = textops.normalize_text(cleaned, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "text"
    ).join(cleaned.select("doc_id", "lang", "source"), "doc_id")
    norm = stage("3 normalize_text", norm)

    # 4. Exact dedup: first occurrence per content hash.
    exact = dedup.exact_dedup(norm, "doc_id", "text")
    deduped = norm.join(
        exact.select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    deduped = stage("4 exact dedup", deduped)

    # 5. ExactSubstr removal of corpus-frequent 8-token spans.
    sub = textops.dedup_substrings(deduped, "doc_id", "text", k=8, min_df=2)
    substr = sub.select(F.col("id").alias("doc_id"), "text").join(
        deduped.select("doc_id", "lang", "source"), "doc_id"
    ).withColumn("n_tokens", F.size(tokens(F.col("text"))))
    substr = stage("5 dedup_substrings", substr, "n_tokens")

    # 6. Near-dup clusters -> keep the longest member per cluster.
    pairs = dedup.minhash_lsh_pairs(
        substr, "doc_id", "text", k=3, num_hashes=16, band_size=4
    )
    comps = graph.connected_components(pairs, "id_a", "id_b")
    canon = sampling.keep_canonical_per_component(
        comps,
        substr.select("doc_id", F.length("text").alias("n_chars")),
        id_col="doc_id",
        len_col="n_chars",
    )
    drop = (
        comps.join(canon, "comp")
        .filter(F.col("id") != F.col("keep_id"))
        .select(F.col("id").alias("doc_id"))
    )
    lexical = substr.join(drop, "doc_id", "left_anti")
    lexical = stage("6 minhash+CC keep-longest", lexical, "n_tokens")

    # 7. SemDeDup over the survivors that have embeddings (docs without
    # an embedding row pass through untouched).
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    surv_emb = lexical.select("doc_id").join(emb, "doc_id")
    seeds = surv_emb.orderBy("doc_id").limit(8).collect()
    kept_sem = similarity.semdedup(
        surv_emb, id_col="doc_id", vec_col="v", tau=0.25,
        centroids=([list(r.v) for r in seeds], [int(r.doc_id) for r in seeds]),
    ).select(F.col("id").alias("doc_id"))
    sem_drop = surv_emb.select("doc_id").join(kept_sem, "doc_id", "left_anti")
    semantic = lexical.join(sem_drop, "doc_id", "left_anti")
    semantic = stage("7 semdedup", semantic, "n_tokens")

    # 8. Token-budget mix: ~60% of the surviving tokens, 3:1 across two
    # source groups (map sources onto two buckets for the demo).
    grouped = semantic.withColumn(
        "sgrp",
        F.when(F.pmod(F.crc32("source"), F.lit(2)) == 0, "web")
        .otherwise("books"),
    )
    total = grouped.agg(F.sum("n_tokens")).collect()[0][0]
    mixed = sampling.budget_mix(
        grouped, "sgrp", "doc_id", "n_tokens",
        budget=int(total * 3) // 5, weights={"web": 3, "books": 1},
    )
    mixed = stage("8 budget_mix", mixed, "n_tokens")

    # 9. Stable hash split.
    split = sampling.hash_split(
        mixed.select(F.col("id").alias("doc_id")), "doc_id"
    )
    print("9 hash_split              ",
          {r["split"]: r["n"] for r in
           split.groupBy("split").agg(F.count("*").alias("n")).collect()})

    # 10. Pack the train split into fixed-length examples.
    train_docs = semantic.join(
        split.filter("split = 'train'").select(F.col("id").alias("doc_id")),
        "doc_id",
    )
    packed = sampling.pack_sequences(
        train_docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n")),
        "doc_id", "n", budget=256,
    )
    n_packs = packed.select("slice", "pack_id").distinct().count()
    print(f"10 pack_sequences          {n_packs:>7,} packed examples "
          f"(max 256 tokens) from {packed.count():,} docs")

    # 11. Train a BPE tokenizer ON the curated train split (one corpus
    # scan -> distinct-word table -> greedy merge loop) and encode it.
    merges = textops.bpe_train(train_docs, "text", num_merges=16)
    enc = textops.bpe_encode(
        train_docs, "doc_id", "text", [(a, b) for a, b, _ in merges]
    )
    n_sub = enc.agg(F.sum("n_tokens")).collect()[0][0]
    n_ws = train_docs.select(
        F.sum(F.size(tokens(F.col("text"))))
    ).collect()[0][0]
    top = ", ".join(a + b for a, b, _ in merges[:5])
    print(f"11 bpe_train+encode        {len(merges)} merges learned "
          f"(top: {top}); {n_sub:,} subword tokens over "
          f"{n_ws:,} words")


if __name__ == "__main__":
    main()
