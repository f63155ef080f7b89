"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: probes are broadcast,
  the scan over the corpus is embarrassingly parallel, ranking is a
  per-probe top-k window. Exact baseline; O(probes × corpus).
- :func:`lsh_sign_buckets` / :func:`lsh_ann_pairs` — random-hyperplane
  LSH: deterministic ±1 hyperplanes derived from the portable hash, so
  signatures are reproducible across engines. The 100 TB path: corpus
  is bucketed once (write-time), probes only scan their own bucket.

The dot products are ordered left-folds over array elements in Catalyst
(`aggregate`/`zip_with`) — float64 arithmetic in deterministic order, so
a SQL oracle computing the same ordered sum matches bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered float64 dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each probe, the k nearest
    corpus vectors (excluding itself).

    Plan: broadcast probes × corpus scan -> per-probe top-k window.
    Ties broken by corpus id for full determinism.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))
    scored = (
        c.join(F.broadcast(p), F.col("cand_id") != F.col("probe_id"))
        .withColumn(
            "cosine",
            F.round(cosine(F.col("probe_vec"), F.col("cand_vec")), round_digits),
        )
        .select("probe_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "cand_id", "cosine", "rank")
    )


def hyperplane_matrix(dim: int, num_planes: int) -> list[list[float]]:
    """Deterministic ±1.0 hyperplanes: w[j][d] = +1 if bit0(md5(j#d)) else -1
    (same md5 scheme as :func:`portable_hash.phash`, computed driver-side)."""
    return [
        [
            1.0 if int(hashlib.md5(f"{j}#{d}".encode()).hexdigest()[:15], 16) & 1 else -1.0
            for d in range(dim)
        ]
        for j in range(num_planes)
    ]


def lsh_sign_buckets(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
) -> DataFrame:
    """Random-hyperplane signature: bit j = (v . w_j >= 0), packed into
    one long. Per-row computation only — at scale this is the write-time
    bucketing pass; queries then touch a single bucket.

    The plane matrix travels as a broadcast one-row dimension, NOT as
    plan literals: num_planes x dim literal doubles would explode the
    generated code (at dim=1024 the plan itself becomes megabytes and
    the method exceeds JIT limits); as data, the codegen is tiny and
    independent of dim.
    """
    spark = df.sparkSession
    planes = spark.createDataFrame(
        [(hyperplane_matrix(dim, num_planes), [float(1 << j) for j in range(num_planes)])],
        "planes array<array<double>>, pow2 array<double>",
    )
    v = F.col(vec_col)
    sig = F.aggregate(
        F.zip_with(
            F.col("planes"),
            F.col("pow2"),
            lambda w, p: F.when(dot(v, w) >= 0, p).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    ).cast("long")
    return df.crossJoin(F.broadcast(planes)).select(
        F.col(id_col).alias("id"), sig.alias("bucket")
    )


def ivf_centroid_data(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
) -> tuple[list[list[float]], list[int]]:
    """Deterministic IVF coarse centroids: the vectors with the
    ``num_centroids`` smallest ids. A real deployment would k-means these;
    determinism matters more here (cross-engine oracle), and the
    query-path mechanics (assign, probe, list-restricted search) are
    identical either way. Driver-side collect of C rows — centroids are
    dimension data, like the LSH plane matrix."""
    rows = (
        df.filter(F.col(id_col) < num_centroids)
        .select(
            F.col(id_col).cast("int").alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy("cid")
        .collect()
    )
    return [list(r.cv) for r in rows], [r.cid for r in rows]


def ivf_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
    iters: int = 1,
    round_digits: int = 6,
    scale: int = 10**7,
) -> tuple[list[list[float]], list[int]]:
    """Lloyd's k-means refinement of the seed centroids — the real
    recall story for the IVF index (the seed alone is deterministic but
    arbitrary; one refinement round already moves each centroid to its
    list's mean).

    Every step is deterministic AND cross-engine reproducible, so the
    refined assignment stays oracle-checkable:

    - assignment: the same rounded-cosine argmax fold as
      :func:`ivf_assign` (map-only, no shuffle);
    - update: the per-(list, dim) mean is computed in INTEGER space —
      ``floor(sum(round(val * scale)) / n) / scale`` — sums of longs are
      exact and order-independent, so Spark's parallel aggregation and
      DuckDB's serial one agree bit-for-bit (a plain double ``avg``
      would differ by summation order);
    - an empty list keeps its previous centroid.

    Per iteration: one map-only assignment pass + one (C x D)-group hash
    agg — at 100 TB both are single scans with tiny shuffles (C·D
    rows). Centroids are dimension data (collected to the driver), like
    the LSH plane matrix.
    """
    import math

    cvs, cids = ivf_centroid_data(
        df, id_col=id_col, vec_col=vec_col, num_centroids=num_centroids
    )
    for _ in range(iters):
        assigned = ivf_assign(
            df,
            id_col=id_col,
            vec_col=vec_col,
            num_centroids=num_centroids,
            round_digits=round_digits,
            centroids=(cvs, cids),
        )
        stats = (
            assigned.join(
                df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "id"
            )
            .select(
                "centroid_id",
                F.posexplode(F.col("v").cast("array<double>")).alias("pos", "val"),
            )
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum(F.round(F.col("val") * scale).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cid.setdefault(r.centroid_id, {})[r.pos] = (
                math.floor(r.s / r.n) / scale
            )
        cvs = [
            [by_cid[cid][p] for p in range(len(cv))] if cid in by_cid else cv
            for cv, cid in zip(cvs, cids)
        ]
    return cvs, cids


def ivf_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
    round_digits: int = 6,
    centroids: tuple[list[list[float]], list[int]] | None = None,
) -> DataFrame:
    """IVF list assignment: each vector -> its nearest centroid (max
    cosine, ties to the lowest centroid id).

    The argmax is a per-row fold over the broadcast centroid matrix —
    **no shuffle, no join explosion**: at 100 TB this is a map-only pass
    (the write-time partitioning step; queries then read one list).
    Struct comparison does the argmax: max of (cosine, -centroid_id).

    ``centroids``: explicit ``(vectors, ids)`` — pass
    :func:`ivf_train`'s output to assign against refined centroids;
    default derives the deterministic seed from ``df``.
    """
    spark = df.sparkSession
    if centroids is not None:
        cvs, cids = centroids
    else:
        cvs, cids = ivf_centroid_data(
            df, id_col=id_col, vec_col=vec_col, num_centroids=num_centroids
        )
    cents = spark.createDataFrame(
        [(cvs, cids)], "cents array<array<double>>, cids array<int>"
    )
    v = F.col(vec_col)
    scored = F.zip_with(
        F.col("cents"),
        F.col("cids"),
        lambda c, i: F.struct(
            F.round(cosine(v, c), round_digits).alias("cos"),
            (-i).cast("int").alias("negid"),
        ),
    )
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(-2.0).alias("cos"), F.lit(-(2**31 - 1)).cast("int").alias("negid")
        ),
        lambda acc, s: F.greatest(acc, s),
    )
    return df.crossJoin(F.broadcast(cents)).select(
        F.col(id_col).alias("id"),
        (-best["negid"]).cast("int").alias("centroid_id"),
        best["cos"].alias("centroid_cosine"),
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
    nprobe: int = 2,
    k: int = 5,
    round_digits: int = 6,
    centroids: tuple[list[list[float]], list[int]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: search only the ``nprobe`` most promising
    inverted lists per probe instead of the whole corpus.

    Plan shape (the scale story): corpus assignment is the map-only fold
    above; the probe->centroid ranking touches P x C rows (tiny); the
    candidate join is an equi-join on ``centroid_id`` with the probe side
    broadcast — the corpus is scanned once and only ~nprobe/C of it
    reaches the exact-cosine ranking window.
    """
    assigned = ivf_assign(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        num_centroids=num_centroids,
        round_digits=round_digits,
        centroids=centroids,
    ).join(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("cand_vec")),
        "id",
    )

    spark = corpus.sparkSession
    if centroids is not None:
        cvs, cids = centroids
    else:
        cvs, cids = ivf_centroid_data(
            corpus, id_col=id_col, vec_col=vec_col, num_centroids=num_centroids
        )
    cent_rows = spark.createDataFrame(
        list(zip(cids, cvs)), "cid int, cv array<double>"
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    pc_w = Window.partitionBy("probe_id").orderBy(
        F.desc("c_cos"), F.asc("cid")
    )
    probe_cents = (
        p.crossJoin(F.broadcast(cent_rows))
        .withColumn(
            "c_cos", F.round(cosine(F.col("probe_vec"), F.col("cv")), round_digits)
        )
        .withColumn("crank", F.row_number().over(pc_w))
        .filter(F.col("crank") <= nprobe)
        .select("probe_id", "probe_vec", F.col("cid").alias("p_centroid_id"))
    )

    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        assigned.join(
            F.broadcast(probe_cents),
            (F.col("centroid_id") == F.col("p_centroid_id"))
            & (F.col("id") != F.col("probe_id")),
        )
        .withColumn(
            "cosine", F.round(cosine(F.col("probe_vec"), F.col("cand_vec")), round_digits)
        )
        .select("probe_id", F.col("id").alias("cand_id"), "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_ann_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    min_cosine: float = 0.0,
    round_digits: int = 6,
) -> DataFrame:
    """ANN candidate pairs: same sign-bucket, verified by exact cosine.

    The join key is the packed signature — an equi-join, so Spark plans
    a hash join keyed on the bucket; no pairwise cross product exists.
    """
    b = lsh_sign_buckets(df, id_col=id_col, vec_col=vec_col, dim=dim, num_planes=num_planes)
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    bv = b.join(v, "id")
    a = bv.alias("a")
    c = bv.alias("b")
    return (
        a.join(c, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("cosine", F.round(cosine(F.col("a.vec"), F.col("b.vec")), round_digits))
        .filter(F.col("cosine") >= min_cosine)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.bucket").alias("bucket"),
            "cosine",
        )
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x| / 127,
    q[i] = round(x[i] / scale) — the 4x storage/bandwidth reduction an
    embedding store applies before the ANN index at corpus scale (dot
    products on int8 then run in SIMD integer units downstream).

    Engine-exact: max/abs/division are correctly-rounded IEEE ops and
    both engines round halves away from zero, so (scale, qvec) is
    bit-identical in the SQL oracle. All-zero vectors quantize to zeros
    with scale 0. Map-only — no shuffle at any scale.
    """
    v = F.col(vec_col)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (mx / F.lit(127.0)).alias("scale")
    q = F.when(
        mx == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.round(x * F.lit(127.0) / mx).cast("int"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        scale,
        q.alias("qvec"),
    )


class IvfIndex:
    """Persistent IVF index for INCREMENTAL approximate nearest-neighbor
    search — the embedding-space sibling of ``dedup.LshIndex`` /
    ``dedup.ExactIndex``. ``build()`` trains the coarse centroids once
    (integer-exact Lloyd's refinement, :func:`ivf_train`) and stores
    them with the corpus assignments; ``add()`` assigns arriving vectors
    against the STORED centroids — a map-only broadcast fold, no
    retraining, cost O(batch) — and appends them to their inverted
    lists; ``topk()`` reads only the probed lists (the parquet layout
    is partitioned by ``centroid_id``, so unprobed lists are pruned at
    the directory level).

    At corpus scale this is the write-once/search-many ANN shape: the
    expensive global pass (centroid training) happens once, each batch
    pays one scan of itself, and a query touches ~nprobe/C of the
    corpus. With ``nprobe == num_centroids`` results are EXACT (equal
    to brute-force cosine top-k) regardless of where the centroids
    landed — the oracle gate pins that identity.
    """

    def __init__(self, spark, path: str):
        import os

        self.spark = spark
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self._meta = os.path.join(self.path, "centroids.json")
        self._data = os.path.join(self.path, "lists")

    def _centroids(self) -> tuple[list[list[float]], list[int]]:
        import json
        import os

        if not os.path.exists(self._meta):
            raise ValueError(f"index at {self.path} has no centroids; build() first")
        with open(self._meta) as f:
            m = json.load(f)
        return m["vectors"], m["ids"]

    def build(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        *,
        num_centroids: int = 8,
        iters: int = 1,
    ) -> DataFrame:
        """Train centroids on ``df`` and index it. Returns assignments."""
        import json
        import os

        cvs, cids = ivf_train(
            df,
            id_col=id_col,
            vec_col=vec_col,
            num_centroids=num_centroids,
            iters=iters,
        )
        tmp = self._meta + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"vectors": cvs, "ids": cids}, f)
        os.replace(tmp, self._meta)
        return self.add(df, id_col, vec_col)

    def add(
        self, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> DataFrame:
        """Assign ``df`` against the stored centroids (map-only) and
        append to the inverted lists. Returns the assignments."""
        cvs, cids = self._centroids()
        assigned = ivf_assign(
            df, id_col=id_col, vec_col=vec_col, centroids=(cvs, cids)
        ).join(
            df.select(
                F.col(id_col).cast("long").alias("id"),
                F.col(vec_col).cast("array<double>").alias("vec"),
            ),
            "id",
        )
        out = assigned.localCheckpoint(eager=True)  # pin before the append
        # One task per populated list bounds the small-file count (same
        # rationale as ExactIndex's count-sized append).
        out.select("id", "vec", "centroid_id").repartition(
            "centroid_id"
        ).write.mode("append").partitionBy("centroid_id").parquet(self._data)
        return out.select("id", "centroid_id", "centroid_cosine")

    def topk(
        self, probes: DataFrame, *, nprobe: int = 2, k: int = 5,
        id_col: str = "vec_id", vec_col: str = "embedding",
        round_digits: int = 6,
    ) -> DataFrame:
        """Search the index: rank centroids per probe, read ONLY the
        probed lists (partition-pruned scan), exact cosine inside them."""
        cvs, cids = self._centroids()
        spark = self.spark
        cent_rows = spark.createDataFrame(
            list(zip(cids, cvs)), "cid int, cv array<double>"
        )
        p = probes.select(
            F.col(id_col).cast("long").alias("probe_id"),
            F.col(vec_col).cast("array<double>").alias("probe_vec"),
        )
        pc_w = Window.partitionBy("probe_id").orderBy(
            F.desc("c_cos"), F.asc("cid")
        )
        probe_cents = (
            p.crossJoin(F.broadcast(cent_rows))
            .withColumn(
                "c_cos",
                F.round(cosine(F.col("probe_vec"), F.col("cv")), round_digits),
            )
            .withColumn("crank", F.row_number().over(pc_w))
            .filter(F.col("crank") <= nprobe)
            .select("probe_id", "probe_vec", F.col("cid").alias("p_centroid_id"))
        )
        probed = [
            r["p_centroid_id"]
            for r in probe_cents.select("p_centroid_id").distinct().collect()
        ]
        lists = self.spark.read.schema(
            "id long, vec array<double>, centroid_id int"
        ).option("basePath", self._data).parquet(self._data)
        # .where on the partition column prunes unprobed list dirs.
        cands = lists.where(F.col("centroid_id").isin(probed))
        w = Window.partitionBy("probe_id").orderBy(
            F.desc("cosine"), F.asc("cand_id")
        )
        return (
            cands.join(
                F.broadcast(probe_cents),
                (F.col("centroid_id") == F.col("p_centroid_id"))
                & (F.col("id") != F.col("probe_id")),
            )
            .withColumn(
                "cosine",
                F.round(cosine(F.col("probe_vec"), F.col("vec")), round_digits),
            )
            .select("probe_id", F.col("id").alias("cand_id"), "cosine")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
