"""Product quantization: encode, train, and ADC search.

The oracle gates (benchqueries pq_encode / pq_ann_topk) pin the
seed-codebook path cross-engine; these tests pin what SQL can't —
pq_train's integer-exact Lloyd's refinement and the invariants the
lossy compression must still satisfy.
"""

import math

import pytest
from pyspark.sql import functions as F

from sonnerie_spark.operators.similarity import (
    ivf_assign,
    ivf_pq_topk,
    pq_adc_topk,
    pq_codebook_data,
    pq_encode,
    pq_train,
)

SCALE = 10**7


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )


def _scaled(v):
    # round-half-away-from-zero, matching F.round on longs
    return [
        int(math.floor(abs(x) * SCALE + 0.5)) * (1 if x >= 0 else -1) for x in v
    ]


def _model_encode(vec, books):
    sv = _scaled(vec)
    dsub = len(books[0][0])
    codes = []
    for s, book in enumerate(books):
        best = None
        for j, cw in enumerate(book):
            scw = _scaled(cw)
            d = sum((sv[s * dsub + i] - scw[i]) ** 2 for i in range(dsub))
            if best is None or (d, j) < best:
                best = (d, j)
        codes.append(best[1])
    return codes


def test_encode_matches_python_model(emb):
    books = pq_codebook_data(emb, m=4, ksub=16)
    got = {
        r.id: list(r.codes)
        for r in pq_encode(emb, codebooks=books).filter(F.col("id") < 40).collect()
    }
    for r in emb.filter(F.col("vec_id") < 40).collect():
        assert got[r.vec_id] == _model_encode(list(r.embedding), books)


def test_seed_vectors_encode_to_themselves(emb):
    # seed vector j is codeword j in every subspace: distance 0 beats all
    enc = {
        r.id: list(r.codes)
        for r in pq_encode(emb).filter(F.col("id") < 16).collect()
    }
    order = [
        r.vec_id
        for r in emb.select("vec_id").orderBy("vec_id").limit(16).collect()
    ]
    for j, vid in enumerate(order):
        assert enc[vid] == [j, j, j, j]


def test_train_reduces_quantization_error(emb):
    # Lloyd's update can only shrink the summed scaled-int distortion
    def distortion(books):
        rows = emb.collect()
        dsub = len(books[0][0])
        tot = 0
        for r in rows:
            sv = _scaled(list(r.embedding))
            for s, c in enumerate(_model_encode(list(r.embedding), books)):
                scw = _scaled(books[s][c])
                tot += sum(
                    (sv[s * dsub + i] - scw[i]) ** 2 for i in range(dsub)
                )
        return tot

    seed = pq_codebook_data(emb, m=4, ksub=16)
    trained = pq_train(emb, m=4, ksub=16, iters=2)
    assert distortion(trained) < distortion(seed)


def test_train_matches_python_model_one_iter(emb):
    # one Lloyd's round recomputed driver-side in exact integer space
    books = pq_codebook_data(emb, m=4, ksub=16)
    dsub = len(books[0][0])
    rows = emb.collect()
    cells = {}
    for r in rows:
        codes = _model_encode(list(r.embedding), books)
        sv = _scaled(list(r.embedding))
        for s, c in enumerate(codes):
            acc = cells.setdefault((s, c), [[0, 0] for _ in range(dsub)])
            for i in range(dsub):
                acc[i][0] += sv[s * dsub + i]
                acc[i][1] += 1
    want = [
        [
            [
                math.floor(cells[(s, j)][i][0] / cells[(s, j)][i][1]) / SCALE
                for i in range(dsub)
            ]
            if (s, j) in cells
            else cw
            for j, cw in enumerate(book)
        ]
        for s, book in enumerate(books)
    ]
    assert pq_train(emb, m=4, ksub=16, iters=1) == want


def test_adc_distance_is_sum_of_subspace_distances(emb):
    books = pq_codebook_data(emb, m=4, ksub=16)
    dsub = len(books[0][0])
    probes = emb.filter(F.col("vec_id") < 3)
    got = {
        (r.probe_id, r.id): r.adist
        for r in pq_adc_topk(emb, probes, codebooks=books, k=5).collect()
    }
    enc = {
        r.id: list(r.codes) for r in pq_encode(emb, codebooks=books).collect()
    }
    pvecs = {r.vec_id: list(r.embedding) for r in probes.collect()}
    for (pid, cid), adist in got.items():
        sv = _scaled(pvecs[pid])
        want = 0
        for s, c in enumerate(enc[cid]):
            scw = _scaled(books[s][c])
            want += sum((sv[s * dsub + i] - scw[i]) ** 2 for i in range(dsub))
        assert adist == want


def test_adc_topk_ranks_and_excludes_self(emb):
    probes = emb.filter(F.col("vec_id") < 3)
    books = pq_codebook_data(emb, m=4, ksub=16)
    out = pq_adc_topk(emb, probes, codebooks=books, k=5).collect()
    by_probe = {}
    for r in out:
        assert r.id != r.probe_id
        by_probe.setdefault(r.probe_id, []).append((r.rk, r.adist, r.id))
    for pid, rows in by_probe.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        dists = [r[1] for r in rows]
        assert dists == sorted(dists)


def test_ivfpq_full_probe_equals_adc(emb):
    # probing every list makes the coarse stage a no-op: IVF+PQ must
    # return exactly the flat ADC scan
    books = pq_codebook_data(emb, m=4, ksub=16)
    probes = emb.filter(F.col("vec_id") < 3)
    full = ivf_pq_topk(
        emb, probes, num_centroids=8, nprobe=8, codebooks=books, k=5
    )
    flat = pq_adc_topk(emb, probes, codebooks=books, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, flat.collect()))


def test_ivfpq_partial_probe_candidates_come_from_probed_lists(emb):
    books = pq_codebook_data(emb, m=4, ksub=16)
    probes = emb.filter(F.col("vec_id") < 3)
    out = ivf_pq_topk(
        emb, probes, num_centroids=8, nprobe=2, codebooks=books, k=5
    ).collect()
    lists = {
        r.id: r.centroid_id for r in ivf_assign(emb, num_centroids=8).collect()
    }
    # every returned candidate sits in one of its probe's 2 nearest lists,
    # and its adist matches the flat ADC distance for the same pair
    flat = {
        (r.probe_id, r.id): r.adist
        for r in pq_adc_topk(emb, probes, codebooks=books, k=10**9).collect()
    }
    for r in out:
        assert (r.probe_id, r.id) in flat
        assert r.adist == flat[(r.probe_id, r.id)]
        assert lists[r.id] in {
            lists_cid
            for (pid, lists_cid) in _probe_lists(emb, books, nprobe=2)
            if pid == r.probe_id
        }


def _probe_lists(emb, books, nprobe):
    from sonnerie_spark.operators.similarity import cosine, ivf_centroid_data

    cvs, cids = ivf_centroid_data(emb, num_centroids=8)
    rows = emb.filter(F.col("vec_id") < 3).collect()
    out = []
    for r in rows:
        import math

        def cos(a, b):
            s = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return round(s / (na * nb), 6)

        scored = sorted(
            ((cos(list(r.embedding), cv), -cid) for cv, cid in zip(cvs, cids)),
            reverse=True,
        )
        out.extend((r.vec_id, -negcid) for _, negcid in scored[:nprobe])
    return out


def test_ivfpq_plan_never_shuffles_the_corpus(emb):
    # the stored-index side (codes + centroid assignment) must be ONE
    # map-only pass: no sort-merge join, no exchange keyed on the corpus
    # id — only the probe-side rank windows may shuffle (on probe_id)
    import re

    books = pq_codebook_data(emb, m=4, ksub=16)
    probes = emb.filter(F.col("vec_id") < 3)
    plan = (
        ivf_pq_topk(emb, probes, num_centroids=8, nprobe=2, codebooks=books, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    keys = re.findall(r"Exchange \w+partitioning\(([a-z_]+)", plan)
    assert set(keys) <= {"probe_id"}, keys


def test_ivfpq_index_build_add_equals_flat_adc(emb, tmp_path):
    from sonnerie_spark.operators.similarity import IvfPqIndex

    idx = IvfPqIndex(emb.sparkSession, str(tmp_path / "idx"))
    idx.build(
        emb.filter(F.col("vec_id") < 200), num_centroids=4, pq_iters=2
    )
    idx.add(emb.filter(F.col("vec_id") >= 200))
    probes = emb.filter(F.col("vec_id") < 3)
    got = sorted(map(tuple, idx.topk(probes, nprobe=4, k=5).collect()))
    # flat ADC with the SAME stored (trained-on-batch-1) codebooks
    _, _, books, scale = idx._params()
    want = sorted(
        map(tuple, pq_adc_topk(emb, probes, codebooks=books, k=5).collect())
    )
    assert got == want


def test_ivfpq_index_partial_probe_reads_only_probed_lists(emb, tmp_path):
    from sonnerie_spark.operators.similarity import IvfPqIndex

    idx = IvfPqIndex(emb.sparkSession, str(tmp_path / "idx"))
    idx.build(emb, num_centroids=4, pq_iters=0)
    probes = emb.filter(F.col("vec_id") < 2)
    df = idx.topk(probes, nprobe=1, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition pruning reaches the scan: the centroid_id filter appears
    # as a partition filter, and candidates come only from probed lists
    assert "PartitionFilters" in plan
    part_filters = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "centroid_id" in part_filters
    rows = df.collect()
    assert rows
    full = {
        (r.probe_id, r.id): r.adist
        for r in idx.topk(probes, nprobe=4, k=10**6).collect()
    }
    for r in rows:
        assert full[(r.probe_id, r.id)] == r.adist


def test_semdedup_matches_python_model(emb):
    from sonnerie_spark.operators.similarity import semdedup

    got = {r.id for r in semdedup(emb, num_centroids=8, tau=0.2).collect()}

    # independent model: cluster by rounded argmax cosine, drop anything
    # with a higher-priority tau-similar witness in its cluster
    import math

    rows = {r.vec_id: list(r.embedding) for r in emb.collect()}
    cents = {cid: rows[cid] for cid in range(8)}

    def cos(a, b):
        s = sum(x * y for x, y in zip(a, b))
        return round(
            s
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    assign = {}
    for vid, v in rows.items():
        best = max((cos(v, cv), -cid) for cid, cv in cents.items())
        assign[vid] = (-best[1], best[0])  # cid, ccos
    want = set()
    for vid, (cid, ccos) in assign.items():
        dropped = any(
            ocid == cid
            and (occos, ovid) < (ccos, vid)
            and cos(rows[ovid], rows[vid]) >= 0.2
            for ovid, (ocid, occos) in assign.items()
            if ovid != vid
        )
        if not dropped:
            want.add(vid)
    assert got == want
    # the highest-keep-priority item of every nonempty cluster survives
    for cid in {c for c, _ in assign.values()}:
        top = min(
            (ccos, vid) for vid, (c, ccos) in assign.items() if c == cid
        )
        assert top[1] in got


def test_semdedup_pair_probe_is_equi_join(emb):
    # the within-cluster pair probe must be an equi-join on centroid_id
    # (cluster count bounds the quadratic work) — never a cartesian
    # product over the corpus
    from sonnerie_spark.operators.similarity import semdedup

    plan = (
        semdedup(emb, num_centroids=8, tau=0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # only the tiny one-row centroid literals ride nested-loop joins
    assert plan.count("BroadcastNestedLoopJoin BuildRight, Cross") <= 3


def test_semdedup_probe_salted_when_cores_exceed_clusters(emb):
    # r12 parallelism guard: with C centroids < cores, the probe join's
    # key has only C distinct values and AQE's byte-floor coalescing
    # merged the compute-heavy pair stage to ONE task; the salted form
    # must pin both sides with user repartitions on (cid, _salt), which
    # AQE never coalesces. With C >= cores the guard must vanish.
    from sonnerie_spark.operators.similarity import semdedup

    par = emb.sparkSession.sparkContext.defaultParallelism
    plan = (
        semdedup(emb, num_centroids=8, tau=0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    if par > 8:
        assert "_salt" in plan, plan
        assert plan.count("REPARTITION_BY_NUM") >= 2, plan
    else:
        assert "_salt" not in plan, plan


def test_adc_plan_has_no_corpus_shuffle_before_rank(emb):
    # corpus side must reach the rank window through map-only stages:
    # the only Exchange below the Window is the per-probe hash partition
    books = pq_codebook_data(emb, m=4, ksub=16)
    probes = emb.filter(F.col("vec_id") < 3)
    plan = (
        pq_adc_topk(emb, probes, codebooks=books, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(probe_id") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
