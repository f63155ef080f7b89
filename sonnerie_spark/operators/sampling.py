"""Deterministic sampling / splitting operators for training-data pipelines.

A 100 TB corpus is split and sampled by CONTENT-STABLE hashing, never by
``rand()``: the assignment of a document must not depend on partitioning,
row order, executor count, or rerun — otherwise a re-run of the pipeline
leaks validation docs into train. Everything here derives from the
portable 60-bit md5 hash (functions/portable_hash.py) so the DuckDB
oracle can reproduce assignments bit-for-bit.

All operators are pure Catalyst expressions (no UDFs): the hash is
`conv(substr(md5(x),1,15),16,10)`, JVM-side and codegen-friendly, and
the per-group top-n is one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from sonnerie_spark.functions.portable_hash import phash


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Deterministic train/valid/test split by id-hash bucket.

    bucket = phash(id) mod 100; train < train_pct <= valid <
    train_pct+valid_pct <= test. Adding documents never reassigns an
    existing one (the property random splits lack), and the split is a
    map-only stage — no shuffle at any scale.
    """
    bucket, split = hash_split_expr(
        id_col, train_pct=train_pct, valid_pct=valid_pct
    )
    return df.select(
        F.col(id_col).alias("id"),
        bucket.alias("bucket"),
        split.alias("split"),
    )


def hash_split_expr(
    id_col: str,
    *,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> tuple[Column, Column]:
    """The (bucket, split) EXPRESSIONS behind :func:`hash_split`.

    Exposed so consumers that already hold an id column (e.g. a
    near-dup pair stream) can attach the split assignment map-only
    instead of joining back against a split table — the split is a pure
    deterministic function of the id, so the join carries no
    information, and at scale its build side is a corpus-row-count
    broadcast. Single source of truth for the oracle-critical bucket
    arithmetic (hash_split itself composes these).
    """
    bucket = F.pmod(phash(F.col(id_col).cast("string")), F.lit(100))
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + valid_pct, "valid")
        .otherwise("test")
    )
    return bucket, split


def hash_split_sql(id_expr: str, *, train_pct: int = 80, valid_pct: int = 10) -> str:
    """DuckDB oracle fragment matching :func:`hash_split`."""
    from sonnerie_spark.functions.portable_hash import phash_sql

    b = f"{phash_sql(f'cast({id_expr} as varchar)')} % 100"
    return f"""
    SELECT {id_expr} AS id, {b} AS bucket,
           CASE WHEN {b} < {train_pct} THEN 'train'
                WHEN {b} < {train_pct + valid_pct} THEN 'valid'
                ELSE 'test' END AS split
    """


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    n_per_group: int,
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_group`` smallest
    id-hashes per group (hash order == uniform-random order, but stable).

    One shuffle on the group key; the window is rank-limited so AQE/
    codegen keep it a single pass. At 100 TB the group count (languages,
    sources) is small relative to rows, so the shuffle is the unavoidable
    minimum for any per-group guarantee; skewed groups split via AQE.
    """
    h = phash(F.col(id_col).cast("string"))
    w = Window.partitionBy("grp").orderBy("h", "id")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("id"),
            h.alias("h"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_group)
        .select("grp", "id", "rk")
    )


def stratified_sample_sql(
    table: str, group_expr: str, id_expr: str, *, n_per_group: int
) -> str:
    """DuckDB oracle fragment matching :func:`stratified_sample`."""
    from sonnerie_spark.functions.portable_hash import phash_sql

    h = phash_sql(f"cast({id_expr} as varchar)")
    return f"""
    SELECT grp, id, rk FROM (
      SELECT {group_expr} AS grp, {id_expr} AS id,
             cast(row_number() OVER (PARTITION BY {group_expr}
                                ORDER BY {h}, {id_expr}) AS INTEGER) AS rk
      FROM {table}
    ) WHERE rk <= {n_per_group}
    """


def keep_longest_of_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> DataFrame:
    """Quality-aware near-dup resolution: for every near-duplicate pair,
    the shorter document loses (tie: the larger id loses). Returns the
    distinct removal set.

    ``pairs`` is any (id_a, id_b) near-dup pair stream (n-gram Jaccard,
    MinHash-LSH, SimHash — all bucketed, no all-pairs join); this stage
    adds two equi-joins on id against the 2-column doc-length projection
    (hash-shuffled at scale; Catalyst broadcasts when the projection is
    small) and a distinct on the loser ids. Greedy pairwise resolution
    is the standard scalable alternative to connected-components
    clustering (which needs iteration); it never removes BOTH sides of
    a pair chain's endpoints unless each lost some comparison.
    """
    lens = docs.select(F.col(id_col).alias("_id"), F.col(len_col).alias("_len"))
    j = (
        pairs.join(lens.withColumnRenamed("_id", "id_a").withColumnRenamed("_len", "len_a"), "id_a")
        .join(lens.withColumnRenamed("_id", "id_b").withColumnRenamed("_len", "len_b"), "id_b")
    )
    loser = F.when(
        (F.col("len_a") < F.col("len_b"))
        | ((F.col("len_a") == F.col("len_b")) & (F.col("id_a") > F.col("id_b"))),
        F.col("id_a"),
    ).otherwise(F.col("id_b"))
    return j.select(loser.alias("remove_id")).distinct()


def keep_canonical_per_component(
    comps: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
) -> DataFrame:
    """Exact near-dup resolution over connected components (the precise
    counterpart of greedy :func:`keep_longest_of_pairs`): per component,
    keep the longest member (tie: smallest id), drop the rest.

    ``comps`` is ``graph.connected_components`` output (id, comp).
    Returns (comp, keep_id, n_members). One equi-join against the
    2-column length projection, then one shuffle on the component key;
    both windows share the same partitioning so Catalyst plans a single
    exchange. Component count ~ duplicate-cluster count, far below row
    count, so the shuffle is small at any corpus scale.
    """
    from pyspark.sql import Window

    j = comps.join(
        docs.select(
            F.col(id_col).cast("long").alias("id"), F.col(len_col).alias("_len")
        ),
        "id",
    )
    wp = Window.partitionBy("comp")
    w = wp.orderBy(F.col("_len").desc(), F.col("id"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wp))
        .filter(F.col("rk") == 1)
        .select("comp", F.col("id").alias("keep_id"), "n_members")
    )


def mix_sources_uniform(docs: DataFrame, source_col: str, id_col: str) -> DataFrame:
    """Deterministic corpus mixing: downsample every source to the size
    of the smallest one (the uniform-target special case of weighted
    corpus mixing), selecting by content-stable hash so reruns and
    incremental appends never reshuffle the kept set.

    keep(doc) iff hash(id) % 1e6 * n_source < n_min * 1e6 — pure integer
    arithmetic, bit-identical in the DuckDB oracle (no float rates).
    Plan: one tiny groupBy for per-source counts, the scalar min as an
    unpartitioned window over that per-source table (it holds one row
    per SOURCE, so the single-partition window is trivially bounded) —
    one corpus aggregation total where the old crossJoin(min agg) shape
    evaluated it twice, once per broadcast build — then a map-only
    filter: no shuffle touches the corpus itself, so the stage streams
    at scan speed on 100 TB.
    """
    counts = (
        docs.groupBy(source_col)
        .agg(F.count("*").alias("n_s"))
        .withColumn("n_min", F.min("n_s").over(Window.partitionBy()))
    )
    h = F.pmod(phash(F.col("id").cast("string")), F.lit(1_000_000))
    # decimal-widened like the temperature/weighted variants: h*n_s is
    # h (< 1e6) times a per-source ROW COUNT, which overflows int64 for
    # sources beyond ~9.2e12 rows — in range for the claimed scale.
    dec = "decimal(38,0)"
    return (
        docs.select(F.col(id_col).alias("id"), F.col(source_col).alias("source"))
        .join(F.broadcast(counts.withColumnRenamed(source_col, "source")), "source")
        .filter(
            h.cast(dec) * F.col("n_s").cast(dec)
            < F.col("n_min").cast(dec) * F.lit(1_000_000).cast(dec)
        )
        .select("id", "source")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    budget: int,
    num_slices: int = 16,
) -> DataFrame:
    """Deterministic sequence packing for training-batch construction:
    within each of ``num_slices`` hash slices, documents (in stable
    hash order) fill fixed-``budget`` token packs; a document that would
    straddle a pack boundary starts the next pack, and oversized
    documents are clipped to one full pack.

    The fill recurrence (next start depends on the previous corrected
    end) is inherently sequential — no closed form over a raw cumsum
    exists because each boundary bump shifts every later residue. So
    this is a grouped-map ``applyInPandas`` operator: one Arrow batch
    per slice, a tight Python loop per batch — exactly the per-shard
    shape training pipelines use (packs are built within a shard, never
    across the corpus), so the sequential pass parallelizes across
    slices and scales with executors, not corpus size. The SQL oracle
    replays the identical recurrence with a recursive CTE.

    Output: id, length, slice, pack_id (0-based within slice),
    pack_offset (token start within the pack).
    """
    import pandas as pd

    B = int(budget)
    slices = F.pmod(phash(F.col(id_col).cast("string")), F.lit(num_slices))
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(len_col).cast("long").alias("length"),
        slices.cast("int").alias("slice"),
        phash(F.col(id_col).cast("string")).alias("_h"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd  # self-contained for cloudpickle

        pdf = pdf.sort_values(["_h", "id"], kind="mergesort")
        end = 0
        starts = []
        for ln in pdf["length"]:
            ln = min(int(ln), B)
            if end % B != 0 and end % B + ln > B:
                end += B - end % B  # bump to the next pack boundary
            starts.append(end)
            end += ln
        out = pdf[["id", "length", "slice"]].copy()
        out["pack_id"] = [s // B for s in starts]
        out["pack_offset"] = [s % B for s in starts]
        return out

    return staged.groupBy("slice").applyInPandas(
        pack,
        "id long, length long, slice int, pack_id int, pack_offset long",
    )


def temperature_sample_sqrt(
    docs: DataFrame, group_col: str, id_col: str
) -> DataFrame:
    """Temperature-based corpus sampling at alpha = 0.5 (the standard
    multilingual rebalancing rule p_g ∝ n_g^alpha): each group g keeps
    a sqrt(n_min / n_g) fraction of its documents, flattening the skew
    of large groups while keeping the smallest group intact.

    alpha = 0.5 specifically because it makes the keep rule EXACT: with
    u = hash(id) % 1e6 (a uniform integer), keep iff u < 1e6 *
    sqrt(n_min/n_g) iff u^2 * n_g < n_min * 1e12 — pure integer
    arithmetic (decimal-widened: u^2*n_g can exceed int64), bit-identical
    in the SQL oracle. Other alphas need pow(), which IEEE does not
    require to be correctly rounded, so cross-engine hash-matching would
    flake at keep boundaries.

    Same plan shape as :func:`mix_sources_uniform`: one tiny per-group
    count aggregation (the scalar min rides an unpartitioned window over
    the group-cardinality table instead of a second evaluation of the
    corpus agg), map-only filter over the corpus.
    """
    counts = (
        docs.groupBy(group_col)
        .agg(F.count("*").alias("n_g"))
        .withColumn("n_min", F.min("n_g").over(Window.partitionBy()))
    )
    u = F.pmod(phash(F.col("id").cast("string")), F.lit(1_000_000))
    dec = "decimal(38,0)"
    return (
        docs.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
        .join(F.broadcast(counts.withColumnRenamed(group_col, "grp")), "grp")
        .filter(
            (u * u).cast(dec) * F.col("n_g").cast(dec)
            < F.col("n_min").cast(dec) * F.lit(10**12).cast(dec)
        )
        .select("id", "grp")
    )


def mix_sources_weighted(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, int],
    *,
    strict: bool = True,
) -> DataFrame:
    """Corpus mixing to arbitrary integer target proportions: the output
    is the LARGEST corpus whose source mix is exactly ``weights`` (no
    source oversampled past its actual size). Sources missing from
    ``weights`` are dropped.

    ``strict`` (default): raise if ``weights`` names a source absent
    from the corpus — otherwise the requested mix is silently
    unachievable (a typo'd source contributes nothing, and because the
    binding-source rule keeps proportions exact, every OTHER source is
    scaled down to preserve a ratio against a phantom). The guard
    collects the tiny per-source counts once and reuses them as the
    broadcast side, so strict mode runs the corpus aggregation exactly
    once (at call time); pass strict=False to keep the operator fully
    lazy on hot paths that guarantee the key set.

    With m = argmin(n_s / w_s) (the binding source; deterministic
    tie-break by source name), source s keeps a (n_m * w_s)/(w_m * n_s)
    fraction, selected by content-stable hash with the pure-integer rule
    u * n_s * w_m < 1e6 * n_m * w_s (decimal-widened) — exact in both
    engines, like the uniform and temperature variants.

    Plan: per-source counts joined to the broadcast weight literal, the
    binding source via a 1-row orderBy/limit (broadcast), then a
    map-only corpus filter.
    """
    if not weights or any(int(w) <= 0 for w in weights.values()):
        raise ValueError(
            "mix_sources_weighted: weights must be non-empty and "
            f"strictly positive, got {weights!r} (a zero weight makes "
            "the binding-source ratio n_s/w undefined)"
        )
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())], "src string, w long"
    )
    counts = (
        docs.groupBy(F.col(source_col).alias("src"))
        .agg(F.count("*").alias("n_s"))
        .join(wdf, "src")
    )
    if strict:
        # collect the tiny per-source rows ONCE and rebuild the counts
        # table from them: a bare guard collect would run the full
        # corpus aggregation here AND AGAIN when the returned plan
        # materializes (the broadcast side is not cached)
        rows = counts.collect()
        missing = sorted(set(weights) - {r["src"] for r in rows})
        if missing:
            raise ValueError(
                f"mix_sources_weighted: weights name sources absent from "
                f"the corpus: {missing} (pass strict=False to allow)"
            )
        counts = spark.createDataFrame(rows, counts.schema)
    binding = (
        counts.orderBy((F.col("n_s") / F.col("w")).asc(), F.col("src"))
        .limit(1)
        .select(F.col("n_s").alias("n_m"), F.col("w").alias("w_m"))
    )
    u = F.pmod(phash(F.col("id").cast("string")), F.lit(1_000_000))
    dec = "decimal(38,0)"
    return (
        docs.select(F.col(id_col).alias("id"), F.col(source_col).alias("src"))
        .join(F.broadcast(counts), "src")
        .crossJoin(F.broadcast(binding))
        .filter(
            u.cast(dec) * F.col("n_s").cast(dec) * F.col("w_m").cast(dec)
            < F.lit(1_000_000).cast(dec) * F.col("n_m").cast(dec) * F.col("w").cast(dec)
        )
        .select("id", F.col("src").alias("source"))
    )


def cap_per_group(
    docs: DataFrame, group_col: str, id_col: str, *, max_per_group: int
) -> DataFrame:
    """Keep at most ``max_per_group`` documents per group, selected by
    content-stable hash order — the per-domain/per-source cap every web
    corpus applies so one crawl host cannot dominate training data.

    Scale design: groups already within budget bypass ranking entirely —
    one count aggregation splits the corpus into an under-cap branch
    (kept wholesale, no sort) and an over-cap branch that alone pays the
    per-group rank window. The sorted volume is bounded by the actual
    overflow groups, not the corpus; selection is phash(id) order (ties
    by id), so reruns and appends keep prior survivors until the cap
    forces displacement.

    Integer audit: unlike the mix keep-rules (decimal-widened products)
    this path multiplies nothing — the only bounded integer is Spark's
    ``row_number`` (int32), a 2.1 B-row PER-GROUP ceiling; a single
    group that large should be pre-split upstream regardless (it would
    also be one window partition).
    """
    cap = int(max_per_group)
    base = docs.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp")
    )
    # CACHE CONTRACT: the per-group count table (one row per group) is
    # persisted — BOTH branch joins consume it, and each branch is a
    # separate evaluation, so without the persist the corpus-wide count
    # aggregation runs once per branch. Lazy return relies on
    # ContextCleaner GC (the simhash_near_pairs contract).
    counts = base.groupBy("grp").agg(F.count(F.lit(1)).alias("n_g")).persist()
    joined = base.join(counts, "grp")
    under = joined.filter(F.col("n_g") <= cap).select("id", "grp")
    over = joined.filter(F.col("n_g") > cap)
    w = Window.partitionBy("grp").orderBy(
        phash(F.col("id").cast("string")), F.col("id")
    )
    kept = (
        over.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select("id", "grp")
    )
    return under.unionByName(kept)


def deterministic_shuffle(
    df: DataFrame, id_col: str, *, seed: str = "shuffle", num_partitions: int | None = None
) -> DataFrame:
    """Reproducible global pseudorandom ordering of a corpus:
    ``pos`` = rank of ``phash(seed # id)`` (ties by id), 1-based — the
    deterministic replacement for ``orderBy(rand())`` when a training
    run must shuffle identically across reruns, partition counts and
    engines.

    Scale design: a bare ``Window.orderBy`` would drag the corpus into
    ONE task. Instead: range-partition + in-partition sort on the hash
    key (Spark's distributed sort), persist that single materialization,
    collect only the per-partition ROW COUNTS (num_partitions rows) to
    the driver, and add each partition's cumulative offset to a
    partition-local row_number. The global rank is independent of where
    range boundaries land, so the result is identical at any partition
    count. The persist pins one set of sampled range boundaries — the
    offset table and the ranked rows must come from the same shuffle.
    """
    key = phash(F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string")))
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    s = (
        df.select(F.col(id_col).alias("id"), key.alias("sort_key"))
        .repartitionByRange(n, "sort_key", "id")
        .sortWithinPartitions("sort_key", "id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        sizes = {
            r["pid"]: r["cnt"]
            for r in s.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        offsets, acc = [], 0
        for pid in sorted(sizes):
            offsets.append((pid, acc))
            acc += sizes[pid]
        off = df.sparkSession.createDataFrame(
            offsets or [(0, 0)], "pid int, off long"
        )
        w = Window.partitionBy("pid").orderBy("sort_key", "id")
        out = (
            s.join(F.broadcast(off), "pid")
            .withColumn("pos", F.row_number().over(w) + F.col("off"))
            .select("id", "pos")
        )
        # materialize before unpersist: callers get a stable frame
        return out.localCheckpoint(eager=True)
    finally:
        s.unpersist()


def budget_mix(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    tokens_col: str,
    *,
    budget: int,
    weights: dict[str, int],
    strict: bool = True,
    totals: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Token-budget mixture sampling: draw approximately ``budget``
    tokens from the corpus at the given integer source ``weights`` —
    the "sample 1T tokens at these mixture proportions" pass that sizes
    a training run. Each source s targets budget * w_s / sum(w) tokens
    and keeps a min(1, target_s / T_s) document fraction (T_s = the
    source's total tokens), selected by content-stable hash so the
    sample is reproducible and refresh-stable.

    The keep rule is pure integer arithmetic (the family contract of
    mix_sources_weighted / temperature_sample_sqrt): with u = hash(id)
    % 1e6, keep iff u * T_s * sum(w) < 1e6 * budget * w_s, all
    decimal(38,0)-widened (u*T_s*W reaches ~1e26 at 100 T corpus
    tokens). The cap at 1 needs no branch: when target_s >= T_s the
    inequality holds for every u < 1e6, so under-budget sources keep
    everything. Sources missing from ``weights`` are dropped; ``strict``
    (default) raises when ``weights`` names a source ABSENT from the
    corpus — that source's budget share would silently never be
    delivered. The guard collects the tiny totals once and reuses them
    as the broadcast side (the corpus aggregation runs exactly once, at
    call time); strict=False keeps the operator fully lazy. Callers
    that already hold the per-source token totals (e.g. because the
    ``budget`` itself was derived from them) pass them via ``totals=``
    — a list of ``(source, total_tokens)`` — and the operator runs NO
    corpus aggregation of its own: the broadcast side and the strict
    guard are built from the given rows (r12, guide §2.4 — the old
    shape re-aggregated the corpus for a number the caller had just
    computed). Expected kept tokens per source = min(T_s, budget *
    w_s / W) under the uniform-hash model; exactness is per-document
    determinism, not a hard token count (documents are atomic).

    Plan: one tiny per-source token-total agg joined to the weight
    literal (broadcast), then a map-only corpus filter — no corpus
    shuffle at any scale. Emits (id, source, n_tokens) for the kept
    documents.
    """
    if not weights or any(int(w) <= 0 for w in weights.values()):
        raise ValueError(
            "budget_mix: weights must be non-empty and strictly "
            f"positive, got {weights!r}"
        )
    if int(budget) <= 0:
        raise ValueError(f"budget_mix: budget must be positive, got {budget}")
    spark = docs.sparkSession
    wsum = sum(int(w) for w in weights.values())
    if totals is not None:
        # caller-supplied per-source totals: no corpus aggregation at
        # all — weight join + strict guard run on the local rows
        given = {str(s): int(t) for s, t in totals}
        missing = sorted(set(weights) - set(given))
        if strict and missing:
            raise ValueError(
                f"budget_mix: weights name sources absent from the "
                f"corpus: {missing} (their budget share would silently "
                f"never be delivered; pass strict=False to allow)"
            )
        totals = spark.createDataFrame(
            [
                (s, given[s], int(w))
                for s, w in sorted(weights.items())
                if s in given
            ],
            "src string, t_s long, w long",
        )
    else:
        # the weight dim is only needed on this self-aggregating path —
        # the totals= fast path builds (src, t_s, w) rows directly
        # (ADVICE r12: no dead driver-side createDataFrame work there)
        wdf = spark.createDataFrame(
            [(s, int(w)) for s, w in sorted(weights.items())],
            "src string, w long",
        )
        totals = (
            docs.groupBy(F.col(source_col).alias("src"))
            .agg(F.sum(tokens_col).alias("t_s"))
            .join(wdf, "src")
        )
        if strict:
            # collect the tiny per-source totals ONCE and rebuild the
            # broadcast side from them — a bare guard collect would run
            # the full corpus aggregation twice (here and at action)
            rows = totals.collect()
            missing = sorted(set(weights) - {r["src"] for r in rows})
            if missing:
                raise ValueError(
                    f"budget_mix: weights name sources absent from the "
                    f"corpus: {missing} (their budget share would "
                    f"silently never be delivered; pass strict=False "
                    f"to allow)"
                )
            totals = spark.createDataFrame(rows, totals.schema)
    u = F.pmod(phash(F.col("id").cast("string")), F.lit(1_000_000))
    dec = "decimal(38,0)"
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(source_col).alias("src"),
            F.col(tokens_col).alias("n_tokens"),
        )
        .join(F.broadcast(totals), "src")
        .filter(
            u.cast(dec) * F.col("t_s").cast(dec) * F.lit(wsum).cast(dec)
            < F.lit(1_000_000).cast(dec)
            * F.lit(int(budget)).cast(dec)
            * F.col("w").cast(dec)
        )
        .select("id", F.col("src").alias("source"), "n_tokens")
    )
