"""HyperLogLog distinct sketch: determinism, mergeability, accuracy."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sonnerie_spark.operators import sketch


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("v"),
        (F.col("id") % 2).alias("half"),
    )


def test_sketch_matches_python_model(spark, ids):
    got = {
        r["bucket"]: r["max_rho"]
        for r in sketch.hll_sketch(ids.limit(500), "v").collect()
    }
    exp = {}
    for i in range(500):
        h = int(hashlib.md5(f"user-{i}".encode()).hexdigest()[:15], 16)
        b, y = h % 256, h // 256
        rho = 53 if y == 0 else 52 - (y.bit_length() - 1)
        exp[b] = max(exp.get(b, 0), rho)
    assert got == exp


def test_merge_equals_whole_corpus_sketch(spark, ids):
    whole = sketch.hll_sketch(ids, "v")
    a = sketch.hll_sketch(ids.filter(F.col("half") == 0), "v")
    b = sketch.hll_sketch(ids.filter(F.col("half") == 1), "v")
    merged = sketch.hll_merge(a, b)
    rows = lambda df: {
        (r["bucket"], r["max_rho"]) for r in df.collect()
    }
    assert rows(merged) == rows(whole)


def test_estimate_within_hll_error_bound(spark, ids):
    est = sketch.hll_estimate(sketch.hll_sketch(ids, "v"))
    # standard error for m=256 is ~1.04/sqrt(m) = 6.5%; allow 3 sigma
    assert abs(est - 20000) / 20000 < 0.20


def test_sketch_is_duplicate_insensitive(spark, ids):
    dup = ids.unionByName(ids).unionByName(ids.limit(100))
    rows = lambda df: {
        (r["bucket"], r["max_rho"]) for r in df.collect()
    }
    assert rows(sketch.hll_sketch(dup, "v")) == rows(
        sketch.hll_sketch(ids, "v")
    )


def test_sketch_plan_is_single_agg_no_udf(spark, ids):
    plan = (
        sketch.hll_sketch(ids, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # exactly one exchange: the final bucket aggregation (map-side
    # partials mean at most 256 rows per task cross the wire)
    assert plan.count("Exchange") == 1
