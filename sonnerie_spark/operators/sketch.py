"""Mergeable distinct-count sketches (HyperLogLog), engine-portable.

At 100 TB, exact COUNT(DISTINCT) is a full shuffle of every distinct
value; an HLL sketch reduces the same question to one map-side-combined
hash aggregate producing ``2^b`` integer rows, mergeable across
partitions, runs, and days (merge = per-bucket max). This
implementation is deterministic end-to-end — bucket and rank derive
from the portable md5 hash (functions/portable_hash.py), and the rank
(leading-zero count) is computed by a pure-integer comparison ladder —
so the DuckDB oracle reproduces the sketch bit-for-bit; no engine's
built-in approx_count_distinct (implementation-specific) is involved.

Estimation (float) happens driver-side on the ≤ 2^b-row collected
sketch — bounded dimension data, same class as IVF centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sonnerie_spark.functions.portable_hash import HASH_BITS, phash, phash_sql

__all__ = [
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "hll_rho_sql",
    "hll_sketch_sql",
]


def _ilog2_sql(var: str, max_bits: int) -> str:
    """floor(log2(var)) for var >= 1 as a pure comparison ladder —
    identical ANSI CASE arithmetic in Spark SQL and DuckDB (no float
    log2, whose ulp at exact powers of two differs per libm)."""
    terms = " + ".join(
        f"(CASE WHEN {var} >= {1 << k} THEN 1 ELSE 0 END)"
        for k in range(1, max_bits + 1)
    )
    return f"({terms})"


def hll_rho_sql(y_expr: str, field_bits: int) -> str:
    """Rank of the hash remainder: leading zeros within ``field_bits``
    plus one; ``y = 0`` saturates at field_bits + 1. Portable SQL."""
    il = _ilog2_sql(y_expr, field_bits - 1)
    return (
        f"(CASE WHEN {y_expr} = 0 THEN {field_bits + 1} "
        f"ELSE {field_bits} - {il} END)"
    )


def hll_sketch(
    df: DataFrame, value: Column | str, *, bucket_bits: int = 8
) -> DataFrame:
    """HLL sketch of a string column: ``(bucket, max_rho)``, one row per
    non-empty bucket (≤ 2^bucket_bits rows).

    bucket = low ``bucket_bits`` bits of the 60-bit portable hash; rho
    = leading-zero rank of the remaining field. One hash aggregate with
    map-side partial max — the canonical scale plan: input rows never
    shuffle, only ≤ 2^b partial sketches per task do.
    """
    m = 1 << bucket_bits
    field_bits = HASH_BITS - bucket_bits
    c = F.col(value) if isinstance(value, str) else value
    withy = df.select(phash(c).alias("h")).select(
        F.pmod(F.col("h"), F.lit(m)).cast("int").alias("bucket"),
        F.expr(f"h div {m}").alias("y"),
    )
    rho = F.expr(hll_rho_sql("y", field_bits)).alias("rho")
    return (
        withy.select("bucket", rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_sketch_sql(
    value_expr: str, from_clause: str, *, bucket_bits: int = 8
) -> str:
    """DuckDB oracle producing the identical sketch over
    ``SELECT {value_expr} FROM {from_clause}``."""
    m = 1 << bucket_bits
    field_bits = HASH_BITS - bucket_bits
    h = phash_sql(value_expr)
    return f"""
    SELECT bucket, max(rho) AS max_rho FROM (
      SELECT cast(h % {m} AS INTEGER) AS bucket,
             {hll_rho_sql(f"(h // {m})", field_bits)} AS rho
      FROM (SELECT {h} AS h FROM {from_clause})
    ) GROUP BY bucket
    """


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches: per-bucket max — the property that makes the
    sketch reusable across partitions, runs, and time windows."""
    return (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(sketch: DataFrame, *, bucket_bits: int = 8) -> float:
    """Classic HLL estimate with small-range (linear counting)
    correction. Collects the ≤ 2^b-row sketch — bounded dimension
    data."""
    import math

    m = 1 << bucket_bits
    rows = {r["bucket"]: r["max_rho"] for r in sketch.collect()}
    alpha = 0.7213 / (1 + 1.079 / m)
    z = sum(2.0 ** -rows.get(j, 0) for j in range(m))
    est = alpha * m * m / z
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est
