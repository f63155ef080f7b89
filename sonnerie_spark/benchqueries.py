"""Driver-contract query registry: Spark builders + DuckDB oracle SQL.

Every entry implements one operator from SURVEY.md §2 (sonnerie parity
group, expressed over the ``events`` table as a key/timestamp series) or
a north-star analytics / training-data operator, with an equivalent
ANSI-SQL oracle for the driver's hash-match gate.

Cross-engine determinism rules used throughout (see docstrings):
- timestamps: ``sources.testdata.ts_us`` normalizes either physical
  encoding of ``events.ts`` (long-nanos or timestamp-µs TIMESTAMP_NTZ)
  to µs-since-epoch under the UTC session TZ, equal to DuckDB's
  ``epoch_us(ts)`` bit-for-bit on both encodings.
- monetary / 2-decimal doubles are aggregated as DECIMAL(18,2): integer
  arithmetic, bit-exact in any summation order in both engines; final
  values are cast back to double (same decimal -> same IEEE double).
- float expressions that cannot be exact (cosines) are ordered
  left-folds in both engines, rounded before ranking.
- every top-k has a full deterministic ORDER BY + tie-break.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sonnerie_spark.functions.portable_hash import (
    phash,
    phash_salted,
    phash_salted_sql,
    phash_sql,
)
from sonnerie_spark.operators import dedup, similarity, text as textops, timeseries
from sonnerie_spark.sources.testdata import load, ts_us


@dataclass
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    group: str
    # gate_only: correctness-gate entry excluded from bench.py timing —
    # used for write-path roundtrips whose cost is ingest, not query;
    # write throughput is measured in tools/scale_smoke.py (SCALE.md).
    gate_only: bool = False


REGISTRY: list[QueryDef] = []


def q(name: str, oracle: str | None, group: str, *, gate_only: bool = False):
    def deco(fn):
        REGISTRY.append(QueryDef(name, fn, oracle, group, gate_only))
        return fn

    return deco


def _gate_tmp(prefix: str) -> str:
    """mkdtemp that does not leak: every lifecycle gate (stores,
    indexes, Database roundtrips) materializes scratch state on disk
    and returns a LAZY DataFrame over it, so the directory cannot be
    removed inside the gate — register removal at interpreter exit
    instead (the driver/bench collect happens well before that).
    One bench/gate run previously left 18 directories behind."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


# ---------------------------------------------------------------------------
# The sonnerie series view of the events table:
#   key = event_type || '-' || lpad(user_id, 4, '0'), ts = ns since epoch.

SERIES_SQL = """
  SELECT event_type || '-' || lpad(cast(user_id as varchar), 4, '0') AS key,
         epoch_us(ts) AS ts_us,
         value,
         event_id
  FROM events
"""


def series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        ts_us(ev).alias("ts_us"),
        F.col("value"),
        F.col("event_id"),
    )


DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC) if isinstance(c, str) else c.cast(DEC)


def _spill_boundary(df: DataFrame, spills: list, tag: str) -> DataFrame:
    """Materialize a curation-stage boundary to local parquet and
    re-read it — the GC-immune replacement for persist()/
    localCheckpoint() inside composite gates (r9 verdict #1).

    Cached and locally-checkpointed blocks live in executor STORAGE
    memory until the ASYNC ContextCleaner drains behind a JVM GC, so a
    composite's own stage state could shrink execution memory WHILE the
    gate ran — the in-session inflation class the between-query release
    in bench.py cannot reach (v4 measured 1.86x its isolated time in
    the driver's r9 session despite that release). A parquet spill
    holds the boundary on local disk: zero heap, zero storage memory,
    released deterministically by deleting the directory at the end of
    the composite. It is also exactly what a 100 TB pipeline does
    between curation stages — each stage's output lands in columnar
    storage and the next stage scans it."""
    path = tempfile.mkdtemp(prefix=f"sg-spill-{tag}-")
    spills.append(path)
    _LIVE_SPILLS.add(path)
    target = os.path.join(path, "data")
    df.write.parquet(target)
    # the writer just declared the schema — passing it to the re-read
    # skips parquet footer schema inference, which is a whole extra
    # driver-blocking job (parallelize>mapPartitions over the footers)
    # per boundary (guide §1.1 job-count discipline)
    back = df.sparkSession.read.schema(df.schema).parquet(target)
    # Re-read parallelism guard (guide §2.2/§6): the boundary's writer
    # stage is often AQE-coalesced to very few partitions at gate scale,
    # so the spill lands as 1-2 single-row-group files and the SCAN of
    # the boundary — which feeds the pipeline's most expensive per-row
    # stages (MinHash signatures, pair probes) — cannot split: the whole
    # downstream composite ran on ONE core (measured 3.5 s vs 1.0 s for
    # the v3 LSH stage alone). Spread it only when the scan's natural
    # split count is below the core count — at 100 TB a stage boundary
    # is thousands of splits and this branch never fires, so no exchange
    # is added at scale. Metadata-only decision (file-index partition
    # count; no job).
    par = df.sparkSession.sparkContext.defaultParallelism
    if back.rdd.getNumPartitions() < par:
        back = back.repartition(par)
    return back


# Breakeven for a size-conditional stage boundary: below this many
# SOURCE rows a stage's recompute beats the parquet round-trip's fixed
# costs (extra job + write + N re-read scans). Measured endpoint (r11,
# same-session best-of-3 A/B at sf0.1 = 5k docs): v2's keepq spill
# 22.2 s median vs recompute 11.6 s — the spill DOUBLES the smallest
# composite because its boundary holds ~3.75k rows. The r9 inflation
# class the spill exists to prevent (persist/localCheckpoint state in
# executor storage memory) needs corpus-sized state to matter, so tiny
# stages get neither spill nor cache: plain recompute, which the
# plan-hygiene test already permits. 1M is an engineering estimate one
# to two orders above the measured losing endpoint — at 100 TB every
# real boundary is far past it and always spills.
_SPILL_MIN_SOURCE_ROWS = 1_000_000


def _boundary(
    df: DataFrame,
    spills: list,
    tag: str,
    sf_dir: str,
    table: str = "documents",
    *,
    spread: bool = False,
) -> DataFrame:
    """Size-conditional stage boundary: spill to parquet above the
    breakeven (the 100 TB shape), pass through for recompute below it
    (the gate-scale shape). The decision reads ONLY parquet footers —
    no job, no scan. ``table`` names the source whose row count drives
    the decision (the table the stage actually aggregates).

    ``spread``: opt in for boundaries feeding per-row-HEAVY consumers
    (MinHash signatures, pair probes). The below-breakeven producer is
    typically an AQE-coalesced shuffle (bytes tiny), so such a consumer
    otherwise runs on ONE task — measured 5.07 s single-task for v2's
    signature agg vs ~0.2 s spread (the same stall class the spill
    branch's re-read guard fixes above the breakeven). It must stay
    opt-in: boundaries with cheap map-only consumers pay the extra
    exchange per consumer and win nothing back (measured 2x on
    funnel_conversion / corpus_mix_budget when applied blanket). The
    exchange moves < breakeven rows and never executes at scale
    (guide §2.5)."""
    if _source_rows(sf_dir, table) >= _SPILL_MIN_SOURCE_ROWS:
        return _spill_boundary(df, spills, tag)
    if spread:
        par = df.sparkSession.sparkContext.defaultParallelism
        return df.repartition(par)
    return df


def _source_rows(sf_dir: str, table: str = "documents") -> int:
    """Row count of a source table from parquet footers alone (cheap,
    metadata-only). Unknown layouts count as huge — the safe direction
    is to spill."""
    try:
        import pyarrow.dataset as pads

        return pads.dataset(
            os.path.join(sf_dir, f"{table}.parquet")
        ).count_rows()
    except Exception:
        return 1 << 62


def _finish_composite(out: DataFrame, spills: list) -> DataFrame:
    """Blockify the composite result (one eager localCheckpoint job —
    the result itself must survive its spills), then delete the stage
    spill directories: the checkpoint cut the result's lineage, so the
    spilled parquet is dead the moment it returns. The single
    remaining block set (the result) is released by the harness
    between queries (bench.py _release_session_state)."""
    out = out.localCheckpoint(eager=True)
    for p in spills:
        shutil.rmtree(p, ignore_errors=True)
        _LIVE_SPILLS.discard(p)
    spills.clear()
    return out


# Safety net for gates that raise mid-pipeline (their _finish_composite
# never runs): reap any still-live spill directory at interpreter exit
# so a failing gate cannot leak tmp dirs across a long harness run.
_LIVE_SPILLS: set = set()


@atexit.register
def _reap_live_spills() -> None:
    for p in list(_LIVE_SPILLS):
        shutil.rmtree(p, ignore_errors=True)
    _LIVE_SPILLS.clear()


def load_par(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load + spread across cores. The driver's testdata parquet files
    are single row groups, so the scan cannot split — without this, a
    CPU-heavy per-row operator runs on ONE core. The repartition fires
    ONLY when the scan's natural split count is below the core count
    (the _spill_boundary re-read guard, guide §2.2/§6): at production
    scale the input has thousands of splits, the branch never fires,
    and no corpus-wide exchange is added. Metadata-only decision (scan
    partition count; no job). Results are identical either way."""
    df = load(spark, sf_dir, table)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


# ===========================================================================
# Group 1: sonnerie parity operators (SURVEY §2.1) over the series view
# ===========================================================================


@q(
    "scan_all",
    f"SELECT key, ts_us, value FROM ({SERIES_SQL})",
    "parity",
)
def q_scan_all(spark, sf_dir):
    """O1: full scan of the merged series (storage-order output)."""
    return series(spark, sf_dir).select("key", "ts_us", "value")


@q(
    "key_lookup",
    f"SELECT key, ts_us, value FROM ({SERIES_SQL}) WHERE key = 'click-0000'",
    "parity",
)
def q_key_lookup(spark, sf_dir):
    """O2: exact-key lookup (database_reader.rs:168-175 analogue)."""
    return (
        series(spark, sf_dir)
        .filter(F.col("key") == "click-0000")
        .select("key", "ts_us", "value")
    )


@q(
    "key_range",
    f"SELECT key, ts_us, value FROM ({SERIES_SQL}) WHERE key >= 'click-' AND key < 'error-'",
    "parity",
)
def q_key_range(spark, sf_dir):
    """O3: key-range scan with [after_key, before_key) bounds."""
    return (
        series(spark, sf_dir)
        .filter((F.col("key") >= "click-") & (F.col("key") < "error-"))
        .select("key", "ts_us", "value")
    )


@q(
    "key_wildcard",
    f"SELECT key, ts_us, value FROM ({SERIES_SQL}) WHERE key LIKE 'purchase%3'",
    "parity",
)
def q_key_wildcard(spark, sf_dir):
    """O4: wildcard filter with prefix + suffix (wildcard.rs semantics)."""
    return (
        series(spark, sf_dir)
        .filter(F.col("key").like("purchase%3"))
        .select("key", "ts_us", "value")
    )


# constant absolute time window: works at every scale factor
T_A = "2024-01-10 00:00:00"
T_B = "2024-01-20 00:00:00"
T_A_US = 1704844800000000
T_B_US = 1705708800000000


@q(
    "time_range",
    f"SELECT key, ts_us, value FROM ({SERIES_SQL}) WHERE ts_us >= {T_A_US} AND ts_us < {T_B_US}",
    "parity",
)
def q_time_range(spark, sf_dir):
    """O7: [after-time, before-time) filter — pushed to parquet stats."""
    return (
        series(spark, sf_dir)
        .filter((F.col("ts_us") >= T_A_US) & (F.col("ts_us") < T_B_US))
        .select("key", "ts_us", "value")
    )


@q(
    "project_columns",
    f"SELECT key, value FROM ({SERIES_SQL}) WHERE key LIKE 'signup%'",
    "parity",
)
def q_project_columns(spark, sf_dir):
    """O8: column projection (Catalyst prunes the parquet read schema)."""
    return series(spark, sf_dir).filter(F.col("key").like("signup%")).select("key", "value")


@q(
    "lww_merge",
    f"""
    SELECT key, ts_min,
           count(*) AS n_versions,
           arg_max(value, event_id) AS last_value,
           max(event_id) AS last_txid
    FROM (SELECT key, ts_us // 60000000 AS ts_min, value, event_id FROM ({SERIES_SQL}))
    GROUP BY key, ts_min
    """,
    "parity",
)
def q_lww_merge(spark, sf_dir):
    """O9: last-writer-wins merge. Events bucketed to minutes simulate
    colliding (key, ts) across transactions; event_id is the commit
    order. max_by = the k-way merge tie-break (merge.rs:17-26)."""
    s = series(spark, sf_dir).withColumn("ts_min", F.expr("ts_us div 60000000"))
    return s.groupBy("key", "ts_min").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.max_by("value", "event_id").alias("last_value"),
        F.max("event_id").alias("last_txid"),
    )


@q(
    "delete_markers",
    f"""
    WITH s AS ({SERIES_SQL}),
    dels(first_key, last_key, after_us, before_us, wildcard, del_txid) AS (VALUES
      ('click-', 'click-0100', {T_A_US}, {T_B_US}, '%', 500),
      ('', '', 1704412800000000, 9223372036854775807, '%-0003', 9223372036854775807)
    )
    SELECT key, ts_us, event_id FROM s
    WHERE NOT EXISTS (
      SELECT 1 FROM dels d
      WHERE s.event_id < d.del_txid
        AND (d.first_key = '' OR s.key >= d.first_key)
        AND (d.last_key = '' OR s.key < d.last_key)
        AND s.ts_us >= d.after_us AND s.ts_us < d.before_us
        AND s.key LIKE d.wildcard
    )
    """,
    "parity",
)
def q_delete_markers(spark, sf_dir):
    """O10/O11: delete-marker anti-filter with txid scoping — records are
    suppressed only when older than the marker (database_reader.rs:474-518).
    Implemented as the engine does it: an inlined literal predicate."""
    s = series(spark, sf_dir)
    m1 = (
        (F.col("event_id") < 500)
        & (F.col("key") >= "click-")
        & (F.col("key") < "click-0100")
        & (F.col("ts_us") >= T_A_US)
        & (F.col("ts_us") < T_B_US)
    )
    m2 = (F.col("ts_us") >= 1704412800000000) & F.col("key").like("%-0003")
    return s.filter(~(m1 | m2)).select("key", "ts_us", "event_id")


@q(
    "by_key_stats",
    f"""
    SELECT key, count(*) AS n,
           min(ts_us) AS first_ts, max(ts_us) AS last_ts,
           cast(sum(cast(value as decimal(18,2))) as double) AS sum_value,
           cast(sum(cast(value as decimal(18,2))) as double) / count(*) AS avg_value,
           arg_min(value, ts_us) AS first_value,
           arg_max(value, ts_us) AS last_value
    FROM ({SERIES_SQL}) GROUP BY key
    """,
    "parity",
)
def q_by_key_stats(spark, sf_dir):
    """O19: per-key (per-series) aggregation — the map-over-series
    primitive. Decimal sums are order-independent => bit-exact."""
    s = series(spark, sf_dir)
    sum_dec = F.sum(_dec("value")).cast("double")
    return s.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts_us").alias("first_ts"),
        F.max("ts_us").alias("last_ts"),
        sum_dec.alias("sum_value"),
        (sum_dec / F.count(F.lit(1))).alias("avg_value"),
        F.min_by("value", "ts_us").alias("first_value"),
        F.max_by("value", "ts_us").alias("last_value"),
    )


@q(
    "format_lines",
    f"""
    SELECT key || chr(9) || strftime(make_timestamp(ts_us), '%Y-%m-%d %H:%M:%S')
               || chr(9) || cast(cast(value as decimal(18,2)) as varchar) AS line
    FROM ({SERIES_SQL}) WHERE key LIKE 'error%'
    """,
    "parity",
)
def q_format_lines(spark, sf_dir):
    """O20: text-protocol formatted output (formatted.rs:108-198)."""
    s = series(spark, sf_dir).filter(F.col("key").like("error%"))
    line = F.concat_ws(
        "\t",
        F.col("key"),
        F.date_format(F.timestamp_micros(F.col("ts_us")), "yyyy-MM-dd HH:mm:ss"),
        _dec("value").cast("string"),
    )
    return s.select(line.alias("line"))


# ===========================================================================
# Group 2: north-star analytics (aggregations, joins, windows — SURVEY §2.2)
# ===========================================================================


@q(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
           cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
           cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS sum_disc_price,
           cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2))) * (1 + cast(l_tax as decimal(18,2)))) as double) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "analytics",
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1-style pricing summary; decimal sums for exactness."""
    li = load(spark, sf_dir, "lineitem")
    disc = 1 - _dec("l_discount")
    charge = _dec("l_extendedprice") * disc * (1 + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "top_unshipped_orders",
    """
    SELECT l_orderkey,
           cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < timestamp '1998-03-15 00:00:00'
      AND l_shipdate > timestamp '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "analytics",
)
def q_top_unshipped_orders(spark, sf_dir):
    """TPC-H Q3-style: 3-way join + agg + deterministic top-10.
    Catalyst broadcasts the filtered customer dim automatically."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@q(
    "region_revenue",
    """
    SELECT r_name, n_name,
           cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue,
           count(*) AS n_items
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
    "analytics",
)
def q_region_revenue(spark, sf_dir):
    """5-way star join: dims are broadcast (region/nation/customer),
    the single shuffle is the orders|x|lineitem equi-join + final agg."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        r.join(n, F.col("n_regionkey") == F.col("r_regionkey")).join(
            c, F.col("c_nationkey") == F.col("n_nationkey")
        )
    )
    return (
        o.join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@q(
    "topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
    "analytics",
)
def q_topk_per_group(spark, sf_dir):
    """Top-3 orders by price per priority class (window + row_number)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@q(
    "moving_avg",
    f"""
    SELECT key, ts_us, value,
           cast(sum(cast(value as decimal(18,2))) OVER w as double)
             / count(*) OVER w AS mavg5
    FROM ({SERIES_SQL})
    WINDOW w AS (PARTITION BY key ORDER BY ts_us ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    "analytics",
)
def q_moving_avg(spark, sf_dir):
    """Per-series 5-row moving average (decimal sum => exact)."""
    s = series(spark, sf_dir)
    w = Window.partitionBy("key").orderBy("ts_us").rowsBetween(-4, 0)
    return s.select(
        "key",
        "ts_us",
        "value",
        (F.sum(_dec("value")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "mavg5"
        ),
    )


@q(
    "resample_1h",
    f"""
    SELECT key, (ts_us // 3600000000) * 3600000000 AS bucket_us,
           count(*) AS n,
           cast(sum(cast(value as decimal(18,2))) as double) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM ({SERIES_SQL}) GROUP BY key, bucket_us
    """,
    "analytics",
)
def q_resample_1h(spark, sf_dir):
    """O-resample: tumbling 1h downsample per series (hash agg, map-side
    partials — the 100 TB-friendly shape)."""
    s = series(spark, sf_dir).withColumn(
        "bucket_us", F.expr("(ts_us div 3600000000) * 3600000000")
    )
    return s.groupBy("key", "bucket_us").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@q(
    "sessionize",
    """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
    flagged AS (
      SELECT user_id, ts_us, event_id,
             CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                  WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sess AS (
      SELECT user_id, ts_us,
             cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) as bigint) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, cast(count(*) as bigint) AS n_events,
           max(ts_us) - min(ts_us) AS duration_us
    FROM sess GROUP BY user_id, session_id
    """,
    "analytics",
)
def q_sessionize(spark, sf_dir):
    """Sessionization (30 min gap): lag + running sum, one shuffle.

    Window order carries an event_id tie-break so session assignment is
    deterministic even when two events share a truncated-us timestamp."""
    raw = load(spark, sf_dir, "events")
    ev = raw.select("user_id", ts_us(raw).alias("ts_us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(F.lag("ts_us").over(w).isNull(), 1)
        .when(F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1)
        .otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@q(
    "asof_join",
    """
    WITH clicks AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
                    FROM events WHERE event_type = 'click'),
         views  AS (SELECT user_id, epoch_us(ts) AS ts_us, value
                    FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, c.ts_us, v.value AS view_value, v.ts_us AS view_ts_us
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts_us <= c.ts_us
    """,
    "analytics",
)
def q_asof_join(spark, sf_dir):
    """As-of join: latest prior 'view' for each 'click' per user.
    Spark side uses the union+window formulation (operators.timeseries);
    DuckDB side uses its native ASOF JOIN. (key, ts) pairs are unique in
    the data, so both are deterministic."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", ts_us(ev).alias("ts_us"), "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", ts_us(ev).alias("ts_us"), F.col("value").alias("view_value")
    )
    out = timeseries.asof_join(
        clicks,
        views,
        on="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        right_cols=["view_value"],
    )
    return out.select(
        "event_id", "user_id", "ts_us", "view_value", F.col("asof_ts").alias("view_ts_us")
    )


@q(
    "range_join_purchases",
    """
    WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
               WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, count(c.ts_us) AS clicks_before
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts_us >= p.ts_us - 3600000000 AND c.ts_us < p.ts_us
    GROUP BY p.event_id, p.user_id
    """,
    "analytics",
)
def q_range_join_purchases(spark, sf_dir):
    """Interval join: clicks within the hour before each purchase.
    Equi-join on user_id carries the range predicate as a join filter —
    at scale this is a partitioned hash join, not a cross product."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", ts_us(ev).alias("p_ts"), "event_id"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), ts_us(ev).alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_uid"))
        & (F.col("c_ts") >= F.col("p_ts") - 3_600_000_000)
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_ts").alias("clicks_before")
    )


@q(
    "set_ops_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "analytics",
)
def q_set_ops_users(spark, sf_dir):
    """Set operation: users who clicked but never purchased."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.subtract(buys)  # EXCEPT (distinct) in both engines


@q(
    "rollup_daily",
    """
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) AS n,
           cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type, day)
    """,
    "analytics",
)
def q_rollup_daily(spark, sf_dir):
    """ROLLUP hierarchy totals (type, day) -> (type) -> ()."""
    raw = load(spark, sf_dir, "events")
    ev = raw.withColumn(
        "day", F.date_format(F.timestamp_micros(ts_us(raw)), "yyyy-MM-dd")
    )
    return ev.rollup("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


@q(
    "pivot_user_events",
    """
    SELECT user_id,
           cast(count_if(event_type = 'click') as bigint) AS n_click,
           cast(count_if(event_type = 'view') as bigint) AS n_view,
           cast(count_if(event_type = 'purchase') as bigint) AS n_purchase,
           cast(count_if(event_type = 'signup') as bigint) AS n_signup,
           cast(count_if(event_type = 'error') as bigint) AS n_error
    FROM events GROUP BY user_id
    """,
    "analytics",
)
def q_pivot_user_events(spark, sf_dir):
    """Pivot event counts per user (conditional aggregation form)."""
    ev = load(spark, sf_dir, "events")
    aggs = [
        F.count_if(F.col("event_type") == t).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return ev.groupBy("user_id").agg(*aggs)


@q(
    "distinct_exact_vs_approx",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(DISTINCT props) AS exact_props
    FROM events GROUP BY event_type
    """,
    "analytics",
)
def q_distinct_exact(spark, sf_dir):
    """Exact distinct counts (the approx_count_distinct variant is not
    oracle-comparable across engines; see bench for the approx path)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("props").alias("exact_props"),
    )


# ===========================================================================
# Group 3: training-data pipeline operators (dedup / similarity / text /
# multimodal) over documents + embeddings
# ===========================================================================

# Shared oracle SQL fragments. Shingles: k-word shingles of the space-
# tokenized text; hashes: the portable md5-based 60-bit hash (see
# functions/portable_hash.py) — identical values in both engines.

_SHINGLES_SQL = """
  SELECT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - {km1}, 1) + 1),
             i -> array_to_string(toks[i:i+{km1}], ' ')))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
  )
"""


def shingles_sql(k: int = 3) -> str:
    return _SHINGLES_SQL.format(km1=k - 1)


def ngram_pairs_sql(threshold: float, *, k: int = 3, max_df: int | None = None) -> str:
    """Oracle CTE chain for :func:`dedup.ngram_jaccard_pairs`.

    With ``max_df``, shingles occurring in more than that many documents
    are dropped BEFORE pair enumeration, exactly as the Spark plan drops
    over-long posting lists — both sides then compute the same
    lower-bound jaccard (overlap misses capped shingles; na/nb stay full
    set sizes), so capped results still hash-match.
    """
    sh = f"sh AS ({shingles_sql(k)})"
    if max_df is None:
        src = "sh"
        cap = ""
    else:
        # shingles are distinct per doc, so count(*) per shingle == df
        cap = f""",
    capped AS (
      SELECT s.doc_id, s.shingle
      FROM sh s JOIN (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_df}
      ) ok USING (shingle)
    )"""
        src = "capped"
    return f"""
    WITH {sh}{cap},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS overlap
      FROM {src} a JOIN {src} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b,
             round(overlap / (sa.n + sb.n - overlap), 6) AS jaccard
      FROM co JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
      WHERE overlap / (sa.n + sb.n - overlap) >= {threshold}
    )"""


@q(
    "dedup_exact",
    """
    SELECT digest, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM (SELECT doc_id, md5(text) AS digest FROM documents)
    GROUP BY digest
    """,
    "data",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content digest (hash-groupBy, one shuffle)."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text").select(
        "digest", "keep_id", "n_copies"
    )


@q(
    "dedup_ngram_jaccard",
    ngram_pairs_sql(0.22) + " SELECT id_a, id_b, jaccard FROM pairs",
    "data",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (inverted-index self-join)."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.22)


@q(
    "dedup_ngram_jaccard_capped",
    ngram_pairs_sql(0.22, max_df=64) + " SELECT id_a, id_b, jaccard FROM pairs",
    "data",
)
def q_dedup_ngram_jaccard_capped(spark, sf_dir):
    """The corpus-scale n-gram path: max_df=64 drops stop-shingles before
    pair enumeration. A shingle in f docs emits f^2/2 pair occurrences,
    so one stop-shingle at 100 TB explodes the quadratic hot path; the
    cap bounds every posting list while jaccard becomes a documented
    lower bound (full set sizes, capped overlap). The oracle applies the
    identical cap, so results hash-match exactly."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.22, max_df=64
    )


def _minhash_oracle_sql(
    num_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
    max_bucket_size: int | None = None,
) -> str:
    a_list = ",".join(str(a) for a, _ in dedup.minhash_params(num_hashes))
    b_list = ",".join(str(b) for _, b in dedup.minhash_params(num_hashes))
    cap = (
        ""
        if max_bucket_size is None
        else f" QUALIFY count(*) OVER (PARTITION BY band, bucket)"
        f" <= {int(max_bucket_size)}"
    )
    return f"""
    WITH sh AS ({shingles_sql(k)}),
    base AS (
      SELECT doc_id, {phash_sql("shingle")} % {dedup.MINHASH_BASE_MOD} AS h FROM sh
    ),
    sig AS (
      SELECT doc_id, i,
             min(([{a_list}][i + 1] * h + [{b_list}][i + 1]) % {dedup.MINHASH_MOD}) AS minhash
      FROM base CROSS JOIN range({num_hashes}) t(i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {band_size} AS band,
             md5(string_agg(cast(minhash as varchar), ',' ORDER BY i)) AS bucket
      FROM sig GROUP BY doc_id, band{cap}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


@q("dedup_minhash_lsh", _minhash_oracle_sql(), "data")
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16)+LSH(4 bands of 4) candidate pairs — the near-linear
    scale path for near-dup detection."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, band_size=4
    ).select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))


@q("dedup_minhash_lsh_capped", _minhash_oracle_sql(max_bucket_size=3), "data")
def q_dedup_minhash_lsh_capped(spark, sf_dir):
    """The corpus-scale LSH path with the hot-bucket guard engaged:
    band buckets holding more than max_bucket_size docs emit no pairs
    (same f^2/2 blowup rationale as dedup_ngram_jaccard_capped's
    max_df). The cap is deliberately low (3) so the testdata actually
    exercises it — at sf0.01 it drops the dozen size-4 buckets, so this
    result strictly differs from dedup_minhash_lsh's and the oracle
    (which applies the identical QUALIFY cap) proves the dropped set
    matches exactly."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, band_size=4,
        max_bucket_size=3,
    ).select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))


@q(
    "dedup_simhash",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
      FROM documents
    ),
    th AS (SELECT doc_id, {phash_sql("tok")} AS h FROM tok),
    bitsum AS (
      SELECT doc_id, b,
             cast(sum(case when (h >> b) & 1 = 1 then 1 else -1 end) as bigint) AS s
      FROM th CROSS JOIN (SELECT unnest(range(60)) AS b)
      GROUP BY doc_id, b
    )
    SELECT doc_id AS id,
           cast(sum(case when s > 0 then 1::bigint << b else 0 end) as bigint) AS simhash
    FROM bitsum GROUP BY doc_id
    """,
    "data",
)
def q_dedup_simhash(spark, sf_dir):
    """60-bit SimHash signature per document."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text", bits=60)


@q(
    "text_token_stats",
    f"""
    -- casts: DuckDB len()/length() are BIGINT, Spark size()/length()
    -- are INT; the driver hash is typed, so widths must be identical
    SELECT doc_id AS id,
           cast(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
             AS n_ws_tokens,
           cast(len(regexp_extract_all(text, '{textops.TOKEN_RE}')) AS INTEGER)
             AS n_re_tokens,
           cast(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
    "data",
)
def q_text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex tokens."""
    docs = load_par(spark, sf_dir, "documents")
    return textops.token_stats(docs, "doc_id", "text")


@q(
    "text_quality",
    """
    WITH f AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS np
      FROM documents
    ), g AS (
      SELECT doc_id, nc, np,
             len(toks) AS n,
             len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS n_stop,
             len(list_distinct(toks)) AS n_distinct
      FROM f
    )
    SELECT doc_id AS id, cast(n AS INTEGER) AS n_words,
           floor((nc - (n - 1)) / n * 1e6 + 0.5) / 1e6 AS mean_word_len,
           floor(n_stop / n * 1e6 + 0.5) / 1e6 AS stopword_ratio,
           floor(n_distinct / n * 1e6 + 0.5) / 1e6 AS distinct_ratio,
           floor(np / greatest(nc, 1) * 1e6 + 0.5) / 1e6 AS punct_ratio,
           floor((least(n / 100.0, 1.0) * 0.25
                 + least(((nc - (n - 1)) / n) / 8.0, 1.0) * 0.25
                 + (1.0 - least(n_stop / n * 2, 1.0)) * 0.25
                 + n_distinct / n * 0.25) * 1e6 + 0.5) / 1e6 AS quality_score
    FROM g
    """,
    "data",
)
def q_text_quality(spark, sf_dir):
    """Quality features: length/stopword/type-token/punctuation ratios."""
    docs = load_par(spark, sf_dir, "documents")
    return textops.quality_score(docs, "doc_id", "text")


def _lang_scores_sql() -> str:
    """One SELECT per language, unioned: (doc_id, lang, hits)."""
    parts = []
    for lang, markers in sorted(textops.LANG_MARKERS.items()):
        inlist = ",".join(f"'{m}'" for m in markers)
        parts.append(
            f"SELECT doc_id, '{lang}' AS lang,"
            f" len(list_filter(toks, t -> t IN ({inlist}))) AS hits FROM t"
        )
    return " UNION ALL ".join(parts)


@q(
    "text_lang_id",
    f"""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents),
    s AS ({_lang_scores_sql()}),
    r AS (SELECT doc_id, lang, hits,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY hits DESC, lang DESC) AS rn
          FROM s)
    SELECT doc_id AS id,
           CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
           hits AS marker_hits
    FROM r WHERE rn = 1
    """,
    "data",
)
def q_text_lang_id(spark, sf_dir):
    """Marker-word language ID with argmax-by-(hits, code) tie-break."""
    docs = load_par(spark, sf_dir, "documents")
    out = textops.lang_id(docs, "doc_id", "text")
    return out.select("id", "pred_lang", F.col("marker_hits").cast("long"))


@q(
    "doc_fingerprint",
    f"""
    WITH sh AS ({shingles_sql(5)}),
    h AS (SELECT doc_id, {phash_sql("shingle")} AS hv FROM sh)
    SELECT doc_id AS id,
           array_to_string((list_sort(list(hv)))[1:4], ',') AS fingerprint
    FROM h GROUP BY doc_id
    """,
    "data",
)
def q_doc_fingerprint(spark, sf_dir):
    """Winnowing-style fingerprint: 4 smallest distinct 5-gram hashes.

    Emitted as a comma-joined string (not array<long>) so the driver's
    pandas-based canonicalizer can hash the column."""
    docs = load_par(spark, sf_dir, "documents")
    out = textops.fingerprint(docs, "doc_id", "text", k=5, n_mins=4)
    return out.select("id", F.concat_ws(",", "fingerprint").alias("fingerprint"))


_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]),"
    " (acc, x) -> acc + x)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT_SQL.format(a=a, b=b)
    na = _DOT_SQL.format(a=a, b=a)
    nb = _DOT_SQL.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


@q(
    "embedding_topk",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < 5),
    scored AS (
      SELECT probe_id, vec_id AS cand_id,
             round({_cos_sql("pe", "e")}, 6) AS cosine
      FROM probes JOIN v ON vec_id != probe_id
    ),
    ranked AS (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT probe_id, cand_id, cosine, cast(rank as int) AS rank
    FROM ranked WHERE rank <= 5
    """,
    "data",
)
def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 5 probe vectors: broadcast probes ×
    corpus scan, ordered float64 folds, round(6) before ranking."""
    emb = load_par(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, probes, k=5)


@q(
    "multimodal_meta",
    """
    SELECT doc_id AS media_id,
           cast(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    "data",
)
def q_multimodal_meta(spark, sf_dir):
    """Binary-column plumbing: byte length + digest of an opaque binary
    payload (deterministic stand-in for media bytes; decode path is the
    mapInPandas stub in operators.multimodal, exercised in tests)."""
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return media.select(
        "media_id",
        F.length(F.col("content")).alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
    )


@q(
    "by_key_gaps",
    f"""
    WITH s AS (SELECT key, ts_us FROM ({SERIES_SQL})),
    g AS (SELECT key, ts_us - lag(ts_us) OVER (PARTITION BY key ORDER BY ts_us) AS gap
          FROM s)
    SELECT key, count(*) AS n, coalesce(max(gap), 0) AS max_gap_us
    FROM g GROUP BY key
    """,
    "parity",
)
def q_by_key_gaps(spark, sf_dir):
    """O19 via grouped-map applyInPandas: per-series longest gap — a
    whole-series pass in Python/Arrow, cross-checked against a SQL
    window oracle. (key, ts) pairs are unique so both are deterministic."""
    from sonnerie_spark.operators.bykey import apply_per_series

    s = series(spark, sf_dir).select("key", F.col("ts_us"))

    def gaps(pdf):
        import pandas as pd

        ts = pdf["ts_us"].to_numpy()
        d = ts[1:] - ts[:-1]
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n": [len(ts)],
                "max_gap_us": [int(d.max()) if len(d) else 0],
            }
        )

    return apply_per_series(
        s, gaps, "key string, n long, max_gap_us long", key_col="key", ts_col="ts_us"
    )


@q(
    "simhash_near_pairs",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
      FROM documents
    ),
    th AS (SELECT doc_id, {phash_sql("tok")} AS h FROM tok),
    bitsum AS (
      SELECT doc_id, b,
             cast(sum(case when (h >> b) & 1 = 1 then 1 else -1 end) as bigint) AS s
      FROM th CROSS JOIN (SELECT unnest(range(60)) AS b)
      GROUP BY doc_id, b
    ),
    sig AS (
      SELECT doc_id,
             cast(sum(case when s > 0 then 1::bigint << b else 0 end) as bigint) AS simhash
      FROM bitsum GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, simhash, c AS chunk_idx,
             (simhash >> (c * 6)) & 63 AS chunk_val
      FROM sig CROSS JOIN (SELECT unnest(range(10)) AS c)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, cast(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 9
    """,
    "data",
)
def q_simhash_near_pairs(spark, sf_dir):
    """SimHash near-dup pairs: pigeonhole chunk blocking (any pair within
    hamming 9 shares one of 10 6-bit chunks) -> equi-join on
    (chunk_idx, chunk_val) -> exact hamming verify. No global pairwise
    join anywhere in the plan."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(
        docs, "doc_id", "text", bits=60, max_hamming=9, materialize=True
    )


@q(
    "simhash120_near_pairs",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS tok
      FROM documents
    ),
    th AS (SELECT doc_id, {phash_salted_sql("tok", 0)} AS h0,
                  {phash_salted_sql("tok", 1)} AS h1
           FROM tok),
    bitsum AS (
      SELECT doc_id, b,
             cast(sum(case when (h0 >> b) & 1 = 1 then 1 else -1 end) as bigint) AS s0,
             cast(sum(case when (h1 >> b) & 1 = 1 then 1 else -1 end) as bigint) AS s1
      FROM th CROSS JOIN (SELECT unnest(range(60)) AS b)
      GROUP BY doc_id, b
    ),
    sig AS (
      SELECT doc_id,
             cast(sum(case when s0 > 0 then 1::bigint << b else 0 end) as bigint) AS w0,
             cast(sum(case when s1 > 0 then 1::bigint << b else 0 end) as bigint) AS w1
      FROM bitsum GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           cast(bit_count(xor(a.w0, b.w0))
                + bit_count(xor(a.w1, b.w1)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 12
    """,
    "data",
)
def q_simhash120_near_pairs(spark, sf_dir):
    """SimHash near-dup pairs at 120-bit width (r9): the text-side
    application of the multi-word blocker — dedup.simhash_words emits
    two independent 60-bit salted-family words per document (the
    standard more-bit-planes construction: unrelated docs land ~60
    bits apart at this width, so max_hamming=12 admits far fewer
    false candidates than 60-bit/9 does), then
    dedup.hamming_near_pairs_words blocks with 13 per-word chunks and
    verifies the SUMMED bit_count(xor). The oracle mirrors both
    salted hash families and brute-forces the pair join, so the gate
    proves word independence AND that the blocked plan misses
    nothing."""
    docs = load_par(spark, sf_dir, "documents")
    sigs = dedup.simhash_words(
        docs, "doc_id", "text", words=2, bits_per_word=60
    ).localCheckpoint(eager=True)  # both join sides consume the fold
    return dedup.hamming_near_pairs_words(
        sigs, "id", "simhash", words=2, bits_per_word=60, max_hamming=12
    )


@q(
    "embedding_neardup_pairs",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
               WHERE vec_id < 300),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_cos_sql("a.e", "b.e")}, 6) AS cosine
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.2
    """,
    "data",
)
def q_embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact baseline on a bounded slice
    (the O(n^2) truth the LSH path approximates; ann_lsh_buckets +
    lsh_ann_pairs is the scale variant)."""
    emb = load_par(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    from sonnerie_spark.operators.similarity import cosine

    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cosine") >= 0.2)
        .select("id_a", "id_b", "cosine")
    )


@q(
    "cube_type_day",
    """
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) AS n
    FROM events
    GROUP BY CUBE(event_type, day)
    """,
    "analytics",
)
def q_cube_type_day(spark, sf_dir):
    """CUBE grouping sets: all 4 margin combinations of (type, day) in
    one pass — Spark expands to a single shuffle with grouping-id."""
    raw = load(spark, sf_dir, "events")
    ev = raw.withColumn(
        "day", F.date_format(F.timestamp_micros(ts_us(raw)), "yyyy-MM-dd")
    )
    return ev.cube("event_type", "day").agg(F.count(F.lit(1)).alias("n"))


@q(
    "set_intersect_users",
    """
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "analytics",
)
def q_set_intersect_users(spark, sf_dir):
    """Set intersection: users who both signed up and purchased."""
    ev = load(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return signups.intersect(buys)


@q(
    "label_centroids",
    """
    SELECT label, pos,
           cast(sum(q) as double) / (count(*) * 16777216.0) AS mean_v,
           count(*) AS n
    FROM (
      SELECT label, cast(u.pos AS INTEGER) AS pos,
             cast(floor(cast(u.v as double) * 16777216) as bigint) AS q
      FROM (
        SELECT label,
               unnest(list_transform(range(len(embedding)),
                      i -> struct_pack(pos := i, v := embedding[i + 1]))) AS u
        FROM embeddings
      )
    )
    GROUP BY label, pos
    """,
    "data",
)
def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroid (the k-means update step of a real
    IVF trainer): posexplode to (label, dim, value) and hash-aggregate —
    the 100 TB shape for vector averaging (narrow shuffle rows,
    map-side partials; no whole-vector fold on a single node). Values
    are quantized to 2^-24 fixed point (floor, power-of-two scaling is
    exact on doubles) so the integer sums — and hence the means — are
    order-independent and bit-identical across engines."""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn(
        "q", F.floor(F.col("v").cast("double") * (1 << 24)).cast("long")
    )
    return flat.groupBy("label", "pos").agg(
        (F.sum("q").cast("double") / (F.count(F.lit(1)) * float(1 << 24))).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "anti_join_no_orders",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    "analytics",
)
def q_anti_join_no_orders(spark, sf_dir):
    """Anti join (NOT EXISTS): customers with no urgent order. The
    priority filter is pushed below the join to the orders scan;
    shuffled-hash anti join on the key — at 100 TB both sides partition
    on o_custkey/c_custkey so the probe is local per partition, no
    broadcast needed and no row explosion (anti joins emit at most the
    left side)."""
    cust = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@q(
    "semi_join_priority",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
    GROUP BY o_orderpriority
    """,
    "analytics",
)
def q_semi_join_priority(spark, sf_dir):
    """Semi join (EXISTS) + aggregation — TPC-H Q4 shape: priority
    counts for orders having at least one heavy lineitem. The quantity
    filter is pushed to the lineitem scan BEFORE the join (Catalyst does
    this from the declarative plan), so the semi join probes a fraction
    of the fact table; semi joins also stop at first match, never
    duplicating orders rows."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@q(
    "wordcount_top_terms",
    """
    SELECT term, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    WHERE term <> ''
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 100
    """,
    "data",
)
def q_wordcount_top_terms(spark, sf_dir):
    """Global term-frequency top-k over the corpus (the vocabulary-build
    step of a tokenizer-training pipeline). explode -> hash agg gets
    map-side partial counts, so the shuffle carries one row per distinct
    term per partition, not one per token; the final top-100 is a
    TakeOrdered (per-partition heap + driver merge), never a global
    sort. Tie-broken on term for a deterministic LIMIT."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(100)
    )


@q(
    "salted_top_users",
    """
    SELECT user_id, count(*) AS n_events,
           cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 50
    """,
    "analytics",
)
def q_salted_top_users(spark, sf_dir):
    """Skew-resistant two-phase aggregation: pre-aggregate on
    (user_id, salt) so a hot user's rows split across 16 reducers, then
    merge the partials on user_id alone. The result is exactly GROUP BY
    user_id (counts and decimal sums are associative), but no single
    reducer ever sees all of a hot key — the manual form of what AQE
    skew-join handles for joins. Salt is derived from event_id, not
    rand(), so the query stays deterministic and retry-safe."""
    ev = load(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(_dec("value")).alias("psum"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("psum").cast("double").alias("sum_value"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(50)
    )


@q(
    "histogram_order_totals",
    """
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 13
                ELSE cast(floor(o_totalprice / 50000.0) as bigint) + 1 END AS bucket,
           count(*) AS n
    FROM orders
    GROUP BY bucket
    """,
    "analytics",
)
def q_histogram_order_totals(spark, sf_dir):
    """Fixed-bin histogram of order totals via width_bucket — the fully
    parallel binning shape (map-side bucket id + hash agg; 12 groups,
    so the shuffle is 12 rows per partition). Contrast with ntile: a
    global-rank decile needs a total order (single-partition window);
    fixed or quantile-estimated boundaries keep the plan embarrassingly
    parallel at 100 TB."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12)).alias(
            "bucket"
        )
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


@q(
    "series_direction_changes",
    """
    SELECT key,
           count(*) FILTER (WHERE value > prev) AS n_up,
           count(*) FILTER (WHERE value < prev) AS n_down
    FROM (
      SELECT key, value,
             lag(value) OVER (PARTITION BY key ORDER BY ts_us, event_id) AS prev
      FROM (""" + SERIES_SQL + """)
    )
    WHERE prev IS NOT NULL
    GROUP BY key
    """,
    "analytics",
)
def q_series_direction_changes(spark, sf_dir):
    """lag()-based per-series movement counts (rises/falls between
    consecutive samples). One shuffle on key for the window; counts are
    integers so the result is exact. The (ts_us, event_id) ordering
    tie-break makes lag deterministic under equal timestamps."""
    w = Window.partitionBy("key").orderBy("ts_us", "event_id")
    s = series(spark, sf_dir).withColumn("prev", F.lag("value").over(w))
    return (
        s.filter(F.col("prev").isNotNull())
        .groupBy("key")
        .agg(
            F.count(F.when(F.col("value") > F.col("prev"), 1)).alias("n_up"),
            F.count(F.when(F.col("value") < F.col("prev"), 1)).alias("n_down"),
        )
    )


_IVF_ASSIGN_SQL = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id, c.cid, round({_cos_sql("v.e", "c.ce")}, 6) AS cos
      FROM v CROSS JOIN c
    ),
    r AS (SELECT vec_id, cid, cos,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cid ASC) AS rn
          FROM scored)
"""


@q(
    "ivf_assign",
    f"""
    {_IVF_ASSIGN_SQL}
    SELECT vec_id AS id, cast(cid as int) AS centroid_id, cos AS centroid_cosine
    FROM r WHERE rn = 1
    """,
    "data",
)
def q_ivf_assign(spark, sf_dir):
    """IVF list assignment (write-time pass of the IVF ANN index): each
    vector -> argmax-cosine centroid. Spark side is a per-row fold over
    the broadcast centroid matrix — map-only, no shuffle; the oracle
    ranks the same rounded cosines."""
    emb = load_par(spark, sf_dir, "embeddings")
    return similarity.ivf_assign(emb, num_centroids=8)


@q(
    "ivf_kmeans_assign",
    f"""
    {_IVF_ASSIGN_SQL},
    assign0 AS (SELECT vec_id, cid FROM r WHERE rn = 1),
    -- one Lloyd iteration, integer-exact means: sums of longs are
    -- order-independent, so Spark's parallel agg and this serial one
    -- agree bit-for-bit (a double avg would differ by summation order)
    flat AS (
      SELECT a.cid, generate_subscripts(v.e, 1) - 1 AS pos,
             unnest(v.e) AS val
      FROM assign0 a JOIN v ON v.vec_id = a.vec_id
    ),
    sums AS (
      SELECT cid, pos,
             sum(cast(round(val * 10000000) as bigint)) AS s,
             count(*) AS n
      FROM flat GROUP BY cid, pos
    ),
    means AS (
      SELECT cid, list(floor(s * 1.0 / n) / 10000000.0 ORDER BY pos) AS ce
      FROM sums GROUP BY cid
    ),
    c1 AS (SELECT c.cid, coalesce(m.ce, c.ce) AS ce
           FROM c LEFT JOIN means m ON m.cid = c.cid),
    scored1 AS (
      SELECT v.vec_id, c1.cid, round({_cos_sql("v.e", "c1.ce")}, 6) AS cos
      FROM v CROSS JOIN c1
    ),
    r1 AS (SELECT vec_id, cid, cos,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, cid ASC) AS rn
           FROM scored1)
    SELECT vec_id AS id, cast(cid as int) AS centroid_id, cos AS centroid_cosine
    FROM r1 WHERE rn = 1
    """,
    "data",
)
def q_ivf_kmeans_assign(spark, sf_dir):
    """IVF assignment against k-means-REFINED centroids (one Lloyd
    iteration over the deterministic seed) — closes the recall gap of
    the raw first-C-ids centroids while staying bit-for-bit
    oracle-checkable: the update step computes each (list, dim) mean in
    integer space (floor(sum(round(val*1e7))/n)/1e7), so parallel and
    serial aggregation orders cannot diverge."""
    emb = load_par(spark, sf_dir, "embeddings")
    cents = similarity.ivf_train(emb, num_centroids=8, iters=1)
    return similarity.ivf_assign(emb, num_centroids=8, centroids=cents)


@q(
    "ivf_ann_topk",
    f"""
    {_IVF_ASSIGN_SQL},
    assign AS (SELECT vec_id, cid FROM r WHERE rn = 1),
    pc AS (
      SELECT vec_id AS probe_id, cid, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid ASC) AS crank
      FROM scored WHERE vec_id < 5
    ),
    probe_cents AS (SELECT probe_id, cid FROM pc WHERE crank <= 2),
    cand AS (
      SELECT p.probe_id, a.vec_id AS cand_id
      FROM probe_cents p JOIN assign a ON a.cid = p.cid AND a.vec_id != p.probe_id
    ),
    exact AS (
      SELECT c.probe_id, c.cand_id,
             round({_cos_sql("pv.e", "cv.e")}, 6) AS cosine
      FROM cand c JOIN v pv ON pv.vec_id = c.probe_id
                  JOIN v cv ON cv.vec_id = c.cand_id
    ),
    ranked AS (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM exact
    )
    SELECT probe_id, cand_id, cosine, cast(rank as int) AS rank
    FROM ranked WHERE rank <= 5
    """,
    "data",
)
def q_ivf_ann_topk(spark, sf_dir):
    """IVF approximate top-5 (nprobe=2 of 8 lists) for 5 probes: the
    query-time path of the IVF index — only ~nprobe/C of the corpus
    reaches the exact-cosine ranking (vs the brute-force embedding_topk
    baseline, whose recall this approximates)."""
    emb = load_par(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(emb, probes, num_centroids=8, nprobe=2, k=5)


@q(
    "json_props_agg",
    """
    SELECT cast(json_extract_string(props, '$.k') as bigint) AS k,
           count(*) AS n,
           cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
    FROM events GROUP BY k
    """,
    "analytics",
)
def q_json_props_agg(spark, sf_dir):
    """Semi-structured extraction: pull a field out of the JSON ``props``
    column and aggregate by it (get_json_object stays JVM-side)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


@q(
    "quantiles_by_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
    """,
    "analytics",
)
def q_quantiles_by_type(spark, sf_dir):
    """Exact linear-interpolated quantiles per group (Spark `percentile`
    == DuckDB `quantile_cont`). The approx path at scale is
    approx_percentile / t-digest; exact is the oracle-checkable truth."""
    ev = load(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]))
    return ev.groupBy("event_type").agg(
        F.round(F.element_at(pct, 1), 6).alias("p25"),
        F.round(F.element_at(pct, 2), 6).alias("p50"),
        F.round(F.element_at(pct, 3), 6).alias("p75"),
        F.round(F.element_at(pct, 4), 6).alias("p95"),
    )


@q(
    "small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey,
             cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS total_price,
           count(*) AS n_items
    FROM lineitem li JOIN pa ON li.l_partkey = pa.l_partkey
    WHERE li.l_quantity < 0.5 * pa.avg_qty
    """,
    "analytics",
)
def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-style correlated scalar subquery, decorrelated: per-part
    average quantity joined back onto lineitem (the aggregated side is
    small — broadcast — so the fact table is scanned once, no shuffle
    join). Decimal sums make the threshold bit-exact across engines."""
    li = load(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(pa.withColumnRenamed("l_partkey", "pk")), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# Non-SQL-expressible operators: declared without oracle (driver records
# a rows-only check). These exercise the Python/Arrow boundary.


@q(
    "multimodal_decode_stub",
    """
    SELECT doc_id AS media_id, 'image' AS kind,
           cast(octet_length(encode(text)) AS bigint) AS n_bytes,
           md5(text) AS digest,
           cast(octet_length(encode(text)) % 64 + 1 AS int) AS width,
           cast(octet_length(encode(text)) % 48 + 1 AS int) AS height
    FROM documents
    """,
    "data",
)
def q_multimodal_decode(spark, sf_dir):
    """mapInPandas decode pipeline (stub decoder): media -> features.
    The stub's metadata outputs (byte length, md5 digest, mod-derived
    fake dimensions) are deterministic, so the Arrow plumbing gets a
    full value-hash oracle despite the decode itself being a stub."""
    from sonnerie_spark.operators import multimodal

    docs = load_par(spark, sf_dir, "documents")
    media = multimodal.attach_binary_column(docs, "text", "doc_id")
    return multimodal.decode_features(media).select(
        "media_id", "kind", "n_bytes", "digest", "width", "height"
    )


@q(
    "multimodal_decode_real",
    """
    SELECT doc_id AS media_id, 'ppm' AS codec,
           cast(doc_id % 7 + 1 AS int) AS width,
           cast(octet_length(encode(text)) // (3 * (doc_id % 7 + 1)) AS int)
             AS height,
           true AS valid
    FROM documents
    """,
    "data",
)
def q_multimodal_decode_real(spark, sf_dir):
    """REAL media decoding under the gate: each document is wrapped in a
    genuine binary P6 PPM (header + the text bytes as pixel payload,
    sized so the payload covers width*height*3), and decode_media's
    pure-Python netpbm parser recovers width/height FROM THE BYTES. The
    oracle recomputes the dimensions from the construction arithmetic,
    so a parser that misreads the header (or a payload-size check that
    lies about ``valid``) hash-mismatches. This retires the 'decode is
    only a stub' gap for headerful formats; compressed codecs remain
    behind the decode_features seam."""
    from sonnerie_spark.operators import multimodal

    docs = load_par(spark, sf_dir, "documents")
    n = F.octet_length(F.col("text"))
    w = (F.col("doc_id") % 7 + 1).cast("int")
    h = F.floor(n / (w * 3)).cast("int")
    header = F.concat_ws(
        "", F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(
            F.encode(header, "UTF-8"), F.encode(F.col("text"), "UTF-8")
        ).alias("content"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    return multimodal.decode_media(media).select(
        "media_id", "codec", "width", "height", "valid"
    )


def _lsh_buckets_oracle_sql(dim: int = 64, num_planes: int = 16) -> str:
    """Bit-exact oracle for sign-LSH buckets: the plane weights are all
    +/-1.0, so each dot product is an ordered sum of sign-flipped vector
    elements -- IEEE-exact under the same left fold in both engines
    (list_reduce mirrors F.aggregate's element order; the leading 0.0 in
    Spark's fold is additive-identity-exact)."""
    rows = similarity.hyperplane_matrix(dim, num_planes)
    vals = ",\n      ".join(
        f"({j}, [{','.join('1.0' if x > 0 else '-1.0' for x in row)}]::DOUBLE[])"
        for j, row in enumerate(rows)
    )
    dot = _DOT_SQL.format(a="p.pl", b="v.e")
    return f"""
    WITH planes(j, pl) AS (VALUES {vals}),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    dots AS (
      SELECT v.vec_id AS id, p.j, {dot} AS d
      FROM v CROSS JOIN planes p
    )
    SELECT id,
           cast(sum(CASE WHEN d >= 0 THEN power(2.0, j) ELSE 0.0 END) AS bigint)
             AS bucket
    FROM dots GROUP BY id
    """


@q("ann_lsh_buckets", _lsh_buckets_oracle_sql(), "data")
def q_ann_lsh_buckets(spark, sf_dir):
    """Sign-LSH bucketing of embeddings (16 deterministic md5-seeded
    hyperplanes). Oracle-checked bit-for-bit: +/-1 plane weights keep the
    per-plane dot products IEEE-exact under the shared fold order."""
    emb = load_par(spark, sf_dir, "embeddings")
    return similarity.lsh_sign_buckets(emb, dim=64, num_planes=16)


# ===========================================================================
# Write-path roundtrip gate: LWW + delete txid scoping + compaction get a
# DuckDB-oracle CORRECTNESS row (they are otherwise pytest-only because
# the driver's testdata is read-only). The query builds a THROWAWAY
# Database in a tempdir from the events table, exercises the full write
# lifecycle, and returns the merged read; the oracle models the exact
# same semantics relationally (write.rs / merge.rs / create_tx.rs).
# ===========================================================================

_WP_ORACLE = """
WITH base AS (
  SELECT event_type || '-' || lpad(cast(user_id AS varchar), 4, '0') AS key,
         cast(event_id * 1000 AS bigint) AS ts,
         value, event_type
  FROM events
),
-- run2 overwrites every click row (LWW: later tx wins)
run2 AS (SELECT key, ts, value + 1000 AS value FROM base WHERE event_type = 'click'),
lww12 AS (
  SELECT b.key, b.ts, coalesce(r2.value, b.value) AS value
  FROM base b LEFT JOIN run2 r2 ON b.key = r2.key AND b.ts = r2.ts
),
-- delete marker: wildcard 'click%', ts < cut; applies only to earlier txes
cut AS (SELECT (max(event_id) // 2) * 1000 AS v FROM events),
afterdel AS (
  SELECT * FROM lww12
  WHERE NOT (key LIKE 'click%' AND ts < (SELECT v FROM cut))
),
-- run3 re-adds the deleted slice AFTER the marker: txid scoping keeps it
run3 AS (
  SELECT key, ts, cast(-1 AS double) AS value
  FROM base WHERE event_type = 'click' AND ts < (SELECT v FROM cut)
)
SELECT key, ts, value FROM afterdel
UNION ALL
SELECT key, ts, value FROM run3
"""


@q("write_path_roundtrip", _WP_ORACLE, "parity", gate_only=True)
def q_write_path_roundtrip(spark, sf_dir):
    """O9/O10/O11/O14/O15 as one oracle-checked lifecycle: commit run1
    (all events), run2 (click overwrite, +1000), a delete marker over
    'click%' below the median ts, run3 re-adding the deleted slice
    (value -1, survives via txid scoping), then MAJOR compaction — the
    final read must equal the pre-compaction merge, so the oracle checks
    compaction's marker application + purge too."""

    from sonnerie_spark.db import Database

    base = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        (F.col("event_id") * 1000).cast("long").alias("ts"),
        F.col("value"),
        F.col("event_type"),
        F.col("event_id"),
    )

    def as_records(df):
        return df.select(
            "key",
            "ts",
            F.lit("F").alias("fmt"),
            F.lit(None).cast("array<long>").alias("v_long"),
            F.array(F.col("value")).alias("v_double"),
            F.lit(None).cast("array<string>").alias("v_str"),
            F.lit(None).cast("array<binary>").alias("v_bin"),
        )

    db = Database(spark, _gate_tmp("wp_gate_"))
    db.commit_dataframe(as_records(base), check_duplicates=False)
    run2 = base.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    db.commit_dataframe(as_records(run2), check_duplicates=False)
    cut = (base.agg(F.max("event_id")).first()[0] // 2) * 1000
    db.commit_deletes([{"wildcard": "click%", "before_ns": cut}])
    run3 = base.filter(
        (F.col("event_type") == "click") & (F.col("ts") < cut)
    ).withColumn("value", F.lit(-1.0))
    db.commit_dataframe(as_records(run3), check_duplicates=False)
    db.compact(major=True)
    return db.read_sorted().select(
        "key", "ts", F.element_at("v_double", 1).alias("value")
    )


@q(
    "fold_series",
    f"""
    WITH s AS (
      SELECT key, cast(floor(value * 1000) AS bigint) AS v
      FROM ({SERIES_SQL})
    )
    SELECT key,
           count(v) AS n,
           cast(sum(v) AS double) AS sum,
           cast(min(v) AS double) AS min,
           cast(max(v) AS double) AS max
    FROM s GROUP BY key
    """,
    "parity",
    gate_only=True,
)
def q_fold_series(spark, sf_dir):
    """Database.agg_series — the reference's per-key fold (README.md:
    39-40) as a first-class read, exercised through its driver-side
    Arrow path: commit the series as records, MAJOR-compact (so the
    single-`_U`-run steady state engages the Spark-free fold), then
    fold count/sum/min/max per key. Values are floor(value*1000) —
    integer-valued doubles whose sums are order-independent-exact, so
    the Arrow hash-aggregate, the Spark fallback, and the DuckDB oracle
    agree bit-for-bit."""

    from sonnerie_spark.db import Database

    ev = load(spark, sf_dir, "events")
    recs = ev.select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        # event_id-derived ts: unique per (key, ts) by construction, so
        # no LWW collapse anywhere and the fold counts every event —
        # exactly what the oracle counts.
        (F.col("event_id") * 1000).cast("long").alias("ts"),
        F.lit("i").alias("fmt"),
        F.array(F.floor(F.col("value") * 1000).cast("long")).alias("v_long"),
        F.lit(None).cast("array<double>").alias("v_double"),
        F.lit(None).cast("array<string>").alias("v_str"),
        F.lit(None).cast("array<binary>").alias("v_bin"),
    )
    db = Database(spark, _gate_tmp("fold_gate_"))
    db.commit_dataframe(recs, check_duplicates=False)
    db.compact(major=True)
    rows = db.agg_series()
    from sonnerie_spark.pointread import arrow_agg_series

    assert arrow_agg_series(db) is not None, "steady state must take the Arrow fold"
    return spark.createDataFrame(
        [(r["key"], r["n"], r["sum"], r["min"], r["max"]) for r in rows],
        "key string, n long, sum double, min double, max double",
    )


# ===========================================================================
# Deterministic sampling / splitting (training-pipeline operators):
# content-stable hash assignment, reproducible bit-for-bit in the oracle.
# ===========================================================================

from sonnerie_spark.operators import sampling  # noqa: E402


@q(
    "train_test_split",
    sampling.hash_split_sql("doc_id", train_pct=80, valid_pct=10)
    + " FROM documents",
    "data",
)
def q_train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/valid/test split by id-hash bucket —
    map-only, rerun-stable (adding docs never reassigns existing ones)."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.hash_split(docs, "doc_id", train_pct=80, valid_pct=10)


@q(
    "stratified_sample_lang",
    sampling.stratified_sample_sql(
        "documents", "lang", "doc_id", n_per_group=20
    ),
    "data",
)
def q_stratified_sample_lang(spark, sf_dir):
    """Deterministic stratified sample: 20 docs per language by hash
    rank (uniform but stable; one shuffle on the group key)."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.stratified_sample(docs, "lang", "doc_id", n_per_group=20)


@q(
    "neardup_keep_longest",
    ngram_pairs_sql(0.22, max_df=64)
    + """,
    lens AS (SELECT doc_id, n_chars FROM documents)
    SELECT DISTINCT
           CASE WHEN la.n_chars < lb.n_chars
                  OR (la.n_chars = lb.n_chars AND id_a > id_b)
                THEN id_a ELSE id_b END AS remove_id
    FROM pairs JOIN lens la ON la.doc_id = id_a
               JOIN lens lb ON lb.doc_id = id_b
    """,
    "data",
)
def q_neardup_keep_longest(spark, sf_dir):
    """Quality-aware near-dup resolution: for each 3-gram-Jaccard pair,
    drop the shorter doc (tie: larger id). Pair generation is the
    bucketed posting-list path with the corpus-scale max_df cap — no
    all-pairs join, no uncapped posting list (the oracle applies the
    identical cap; pairs found are a lower bound of the uncapped set)."""
    docs = load_par(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.22, max_df=64
    )
    return sampling.keep_longest_of_pairs(
        docs, pairs.select("id_a", "id_b"), id_col="doc_id", len_col="n_chars"
    )


@q(
    "corpus_curation",
    f"""
    WITH f AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(text) AS nc
      FROM documents
    ), g AS (
      SELECT doc_id, lang, text, nc,
             len(toks) AS n,
             len(list_filter(toks, t -> t IN
                 ('the','a','an','and','or','of','to','in','is','it'))) AS n_stop,
             len(list_distinct(toks)) AS n_distinct
      FROM f
    ), scored AS (
      SELECT doc_id, lang, text,
             floor((least(n / 100.0, 1.0) * 0.25
                   + least(((nc - (n - 1)) / n) / 8.0, 1.0) * 0.25
                   + (1.0 - least(n_stop / n * 2, 1.0)) * 0.25
                   + n_distinct / n * 0.25) * 1e6 + 0.5) / 1e6 AS quality_score
      FROM g
    ), filt AS (
      SELECT * FROM scored WHERE quality_score >= 0.5 AND lang IN ('en','de','fr')
    ), keep AS (
      SELECT min(doc_id) AS doc_id FROM filt GROUP BY md5(text)
    ), kept AS (
      SELECT f.doc_id, f.lang, f.quality_score
      FROM filt f JOIN keep k ON f.doc_id = k.doc_id
    )
    SELECT doc_id AS id, lang, quality_score,
           {phash_sql("cast(doc_id as varchar)")} % 100 AS bucket,
           CASE WHEN {phash_sql("cast(doc_id as varchar)")} % 100 < 80 THEN 'train'
                WHEN {phash_sql("cast(doc_id as varchar)")} % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM kept
    """,
    "data",
)
def q_corpus_curation(spark, sf_dir):
    """End-to-end corpus curation — the composite pipeline a training-
    data run actually executes: quality gate -> language filter -> exact
    dedup (keep lowest id per content digest) -> deterministic hash
    split. One quality pass (pure Catalyst), one dedup aggregation, one
    map-only split stage; the only shuffles are the dedup groupBy and
    its join-back, both on content-hash/id keys that stay balanced at
    any corpus size."""
    docs = load_par(spark, sf_dir, "documents")
    # single projection instead of attach-by-self-join — see
    # _curation_v3_pipeline for the rationale (same head shape)
    filt = (
        textops.quality_score(docs, "doc_id", "text", keep=("lang", "text"))
        .filter(
            (F.col("quality_score") >= 0.5)
            & F.col("lang").isin("en", "de", "fr")
        )
        .select(F.col("id").alias("doc_id"), "lang", "text", "quality_score")
    )
    keep = filt.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = filt.join(keep.select("doc_id"), "doc_id").select(
        "doc_id", "lang", "quality_score"
    )
    bucket = F.pmod(phash(F.col("doc_id").cast("string")), F.lit(100))
    return kept.select(
        F.col("doc_id").alias("id"),
        "lang",
        "quality_score",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@q(
    "key_listing",
    f"SELECT DISTINCT key FROM ({SERIES_SQL}) WHERE key LIKE 'click-%' ORDER BY key",
    "parity",
)
def q_key_listing(spark, sf_dir):
    """Keys-only read (database_reader.rs get_filter_keys): distinct
    matching keys with no value columns in the scan — the plan is
    filter + column-pruned distinct, no LWW aggregation."""
    return (
        series(spark, sf_dir)
        .filter(F.col("key").like("click-%"))
        .select("key")
        .distinct()
        .orderBy("key")
    )


@q(
    "repetition_filter",
    """
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM t
    ),
    pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
    SELECT doc_id AS id,
           cast(sum(c) AS bigint) AS n_ngrams,
           cast(max(c) AS bigint) AS top_ngram_n,
           round(max(c) / cast(sum(c) AS double), 6) AS top_ngram_frac
    FROM pg GROUP BY doc_id
    """,
    "data",
)
def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition signal: per-doc fraction of the 2-gram
    stream held by its most common 2-gram (drop-above-threshold in a
    curation pipeline). Integer aggs -> engine-exact."""
    docs = load_par(spark, sf_dir, "documents")
    return textops.repetition_stats(docs, "doc_id", "text", n=2)


@q(
    "time_weighted_avg",
    f"""
    WITH d AS (
      SELECT key, value,
             lead(ts_us) OVER (PARTITION BY key ORDER BY ts_us, event_id)
               - ts_us AS delta
      FROM ({SERIES_SQL})
    ),
    a AS (
      SELECT key,
             sum(cast(value AS decimal(18,2)) * delta) AS wsum,
             cast(sum(delta) AS bigint) AS tspan
      FROM d WHERE delta IS NOT NULL GROUP BY key
    )
    SELECT key, round(cast(wsum AS double) / tspan, 6) AS twa_value, tspan
    FROM a WHERE tspan > 0
    """,
    "timeseries",
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per series — THE canonical irregular-series
    statistic (each value weighted by how long it was current; a plain
    avg over-weights bursts). One window pass (lead) + one hash agg;
    DECIMAL products keep the weighted sum order-independent-exact, the
    event_id tie-break pins equal-timestamp ordering."""
    s = series(spark, sf_dir)
    w = Window.partitionBy("key").orderBy("ts_us", "event_id")
    d = s.withColumn("delta", F.lead("ts_us").over(w) - F.col("ts_us")).filter(
        F.col("delta").isNotNull()
    )
    a = d.groupBy("key").agg(
        F.sum(_dec("value") * F.col("delta")).alias("wsum"),
        F.sum("delta").cast("long").alias("tspan"),
    )
    return a.filter(F.col("tspan") > 0).select(
        "key",
        F.round(F.col("wsum").cast("double") / F.col("tspan"), 6).alias("twa_value"),
        "tspan",
    )


@q(
    "ohlc_1h",
    f"""
    SELECT key, (ts_us // 3600000000) * 3600000000 AS bucket_us,
           arg_min(value, lpad(cast(ts_us AS varchar), 20, '0') || '-'
                           || lpad(cast(event_id AS varchar), 12, '0')) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, lpad(cast(ts_us AS varchar), 20, '0') || '-'
                           || lpad(cast(event_id AS varchar), 12, '0')) AS close,
           count(*) AS n
    FROM ({SERIES_SQL})
    GROUP BY key, bucket_us
    """,
    "timeseries",
)
def q_ohlc_1h(spark, sf_dir):
    """OHLC downsampling (candlesticks): per key per hour, the first /
    max / min / last value — the other canonical irregular-series
    rollup. One hash aggregation with map-side partials; open/close are
    min_by/max_by on the (ts, event_id) struct so equal-timestamp
    records resolve deterministically."""
    s = series(spark, sf_dir)
    bucket = (F.col("ts_us") / 3600000000).cast("long") * 3600000000
    # fixed-width sortable string: DuckDB arg_min/max keys must be
    # scalar, so both engines order by the same composite VARCHAR
    order = F.concat(
        F.lpad(F.col("ts_us").cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        s.groupBy("key", bucket.alias("bucket_us"))
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_ORDER_STR_SQL = (
    "lpad(cast(ts_us AS varchar), 20, '0') || '-' "
    "|| lpad(cast(event_id AS varchar), 12, '0')"
)


@q(
    "gap_fill_locf",
    f"""
    WITH pb AS (
      SELECT key, (ts_us // 3600000000) * 3600000000 AS bucket_us,
             arg_max(value, {_ORDER_STR_SQL}) AS v
      FROM ({SERIES_SQL}) WHERE key LIKE 'click-000%'
      GROUP BY 1, 2
    ),
    spans AS (SELECT key, min(bucket_us) AS lo, max(bucket_us) AS hi FROM pb GROUP BY key),
    grid AS (
      SELECT key, unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
      FROM spans
    ),
    j AS (
      SELECT g.key, g.bucket_us, pb.v
      FROM grid g LEFT JOIN pb ON g.key = pb.key AND g.bucket_us = pb.bucket_us
    )
    SELECT key, bucket_us,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY bucket_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           v IS NULL AS filled
    FROM j
    """,
    "timeseries",
)
def q_gap_fill_locf(spark, sf_dir):
    """Dense-grid gap filling, last-observation-carried-forward: each
    series gets every hourly bucket between its first and last
    observation; empty buckets carry the previous bucket's closing
    value (`filled` marks them). Grid generation is a per-key sequence
    explode (no cross join with a calendar table); the fill is one
    ignore-nulls window over data already clustered by the grid's
    partitioning. Values are carried exactly — no float arithmetic."""
    HOUR = 3600000000
    s = series(spark, sf_dir).filter(F.col("key").like("click-000%"))
    bucket = (F.col("ts_us") / HOUR).cast("long") * HOUR
    order = F.concat(
        F.lpad(F.col("ts_us").cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    pb = s.groupBy("key", bucket.alias("bucket_us")).agg(
        F.max_by("value", order).alias("v")
    )
    spans = pb.groupBy("key").agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("lo", "hi", F.lit(HOUR))).alias("bucket_us")
    )
    j = grid.join(pb, ["key", "bucket_us"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "key",
        "bucket_us",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("filled"),
    )


@q(
    "series_anomaly_zscore",
    f"""
    WITH a AS (
      SELECT key, count(*) AS n,
             sum(cast(value AS decimal(18,2))) AS s,
             sum(cast(value AS decimal(18,2)) * cast(value AS decimal(18,2))) AS sq,
             arg_max(value, {_ORDER_STR_SQL}) AS last_value
      FROM ({SERIES_SQL}) GROUP BY key
    ),
    z AS (
      SELECT key, cast(n AS bigint) AS n, last_value,
             cast(s AS double) / n AS mean,
             (cast(sq AS double) - cast(s AS double) * (cast(s AS double) / n))
               / (n - 1) AS var
      FROM a WHERE n > 1
    )
    SELECT key, n, round(mean, 6) AS mean,
           round((last_value - mean) / sqrt(var), 6) AS zscore
    FROM z
    WHERE var > 0 AND abs((last_value - mean) / sqrt(var)) > 1.5
    """,
    "timeseries",
)
def q_series_anomaly_zscore(spark, sf_dir):
    """Z-score anomaly scan: series whose LATEST value deviates > 1.5
    sigma from the series mean — the standard streaming-alert shape run
    as one batch pass. Count/sum/sum-of-squares aggregate as exact
    DECIMALs (one hash agg, map-side partials); mean/variance/z are then
    derived with the SAME double expression in both engines, so the
    float results agree bit-for-bit."""
    s = series(spark, sf_dir)
    order = F.concat(
        F.lpad(F.col("ts_us").cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    a = s.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).alias("s"),
        F.sum(_dec("value") * _dec("value")).alias("sq"),
        F.max_by("value", order).alias("last_value"),
    )
    sd = F.col("s").cast("double")
    mean = sd / F.col("n")
    var = (F.col("sq").cast("double") - sd * (sd / F.col("n"))) / (F.col("n") - 1)
    z = (F.col("last_value") - mean) / F.sqrt(var)
    return (
        a.filter(F.col("n") > 1)
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            "last_value",
            mean.alias("mean"),
            var.alias("var"),
            z.alias("z"),
        )
        .filter((F.col("var") > 0) & (F.abs("z") > 1.5))
        .select(
            "key", "n", F.round("mean", 6).alias("mean"), F.round("z", 6).alias("zscore")
        )
    )


# ===========================================================================
# Training-data hygiene: benchmark decontamination + PII-style redaction
# ===========================================================================


@q(
    "decontaminate_benchmark",
    f"""
    WITH sh AS ({shingles_sql(8)}),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    hits AS (
      SELECT s.doc_id AS id, count(*) AS n_hits
      FROM sh s JOIN bench b USING (shingle)
      GROUP BY s.doc_id
    )
    SELECT id, n_hits FROM hits
    """,
    "data",
)
def q_decontaminate_benchmark(spark, sf_dir):
    """Benchmark decontamination: corpus documents sharing any 8-gram
    with the (deterministic pseudo-)eval set doc_id % 97 == 0. The eval
    side collapses to a distinct shingle set and BROADCASTs, so the
    corpus is scanned once with no shuffle on its shingle stream."""
    docs = load_par(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return textops.decontaminate(docs, bench, k=8)


def _decon_bloom_oracle() -> str:
    from sonnerie_spark.operators.sketch import (
        bloom_probe_sql,
        bloom_sketch_sql,
    )

    nb = 1 << 16
    sk = bloom_sketch_sql(
        "shingle",
        "(SELECT shingle FROM sh WHERE doc_id % 97 = 0)",
        num_bits=nb,
        num_hashes=4,
    )
    probe = bloom_probe_sql(
        "id, v",
        "(SELECT doc_id AS id, shingle AS v FROM sh)",
        num_bits=nb,
        num_hashes=4,
    )
    return f"""
    WITH sh AS ({shingles_sql(8)}),
    sk AS ({sk}),
    probe AS ({probe}),
    verd AS (
      SELECT id, v,
             bool_and(sk.bits IS NOT NULL AND (sk.bits & probe.mask) <> 0)
               AS might
      FROM probe LEFT JOIN sk USING (word_idx)
      GROUP BY id, v
    )
    SELECT id, count(*) AS n_probable_hits FROM verd WHERE might GROUP BY id
    """


@q("decontaminate_bloom", _decon_bloom_oracle(), "data")
def q_decontaminate_bloom(spark, sf_dir):
    """Decontamination through a Bloom filter of the benchmark's
    8-gram shingles (r8) — the fixed-size variant of
    decontaminate_benchmark for when the eval side's distinct-shingle
    set is itself too large to broadcast raw. Same pseudo-eval set
    (doc_id % 97 == 0); a 2^16-bit filter so the sf0.1 fill factor
    produces REAL false positives, proving both engines compute the
    SAME deterministic over-flags (the safe direction for hygiene) and
    that every truly contaminated document still appears (no false
    negatives, structurally). Plan: benchmark shingles -> map-side
    bit_or word table; corpus shingles probe it via one BROADCAST
    equi-join + per-(doc, shingle) AND + per-doc count — corpus
    scanned once, shuffle cost independent of benchmark size."""
    docs = load_par(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return textops.decontaminate_bloom(
        docs, bench, k=8, num_bits=1 << 16, num_hashes=4
    )


@q(
    "redact_pii",
    """
    SELECT doc_id AS id,
           cast(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) as int)
             AS n_emails,
           cast(len(regexp_extract_all(text, '[0-9]{9,}')) as int)
             AS n_digit_runs,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{9,}', '<NUMBER>', 'g') AS redacted
    FROM documents
    """,
    "data",
)
def q_redact_pii(spark, sf_dir):
    """PII-style scrub over the corpus: email-shaped and long-digit-run
    tokens replaced by placeholder tags, with per-doc counts — pure
    regexp Catalyst expressions at scan speed, engine-portable patterns
    (character classes only, identical in Java regex and RE2)."""
    docs = load_par(spark, sf_dir, "documents")
    return textops.redact_pii(docs)


@q(
    "pack_sequences",
    f"""
    WITH RECURSIVE ordered AS (
      SELECT doc_id,
             n_chars::BIGINT AS length,
             cast({phash_sql("cast(doc_id as varchar)")} % 16 as int) AS slice,
             {phash_sql("cast(doc_id as varchar)")} AS h,
             row_number() OVER (
               PARTITION BY {phash_sql("cast(doc_id as varchar)")} % 16
               ORDER BY {phash_sql("cast(doc_id as varchar)")}, doc_id
             ) AS rn
      FROM documents
    ),
    packed AS (
      SELECT slice, rn, doc_id, length,
             0::BIGINT AS start_pos,
             least(length, 512) AS end_pos
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.slice, o.rn, o.doc_id, o.length,
             CASE WHEN p.end_pos % 512 != 0
                       AND p.end_pos % 512 + least(o.length, 512) > 512
                  THEN p.end_pos + 512 - p.end_pos % 512
                  ELSE p.end_pos END AS start_pos,
             CASE WHEN p.end_pos % 512 != 0
                       AND p.end_pos % 512 + least(o.length, 512) > 512
                  THEN p.end_pos + 512 - p.end_pos % 512
                  ELSE p.end_pos END + least(o.length, 512) AS end_pos
      FROM packed p JOIN ordered o ON o.slice = p.slice AND o.rn = p.rn + 1
    )
    SELECT doc_id AS id, length, slice,
           cast(start_pos // 512 as int) AS pack_id,
           start_pos % 512 AS pack_offset
    FROM packed
    """,
    "data",
)
def q_pack_sequences(spark, sf_dir):
    """Deterministic per-slice sequence packing (budget 512 tokens, 16
    hash slices): the training-batch construction pass. The greedy fill
    recurrence is sequential, so it runs as one Arrow batch per slice
    (applyInPandas) — parallel across slices, which is how shards are
    packed in practice; the oracle replays the identical recurrence with
    a recursive CTE."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.pack_sequences(docs, "doc_id", "n_chars", budget=512, num_slices=16)


# ===========================================================================
# Group: near-dup clustering (connected components) + corpus mixing
# ===========================================================================

from sonnerie_spark.operators import graph  # noqa: E402


@q(
    "neardup_components",
    graph.cc_oracle_sql(_minhash_oracle_sql())
    + " SELECT id, comp FROM cc",
    "data",
)
def q_neardup_components(spark, sf_dir):
    """Connected components over the MinHash-LSH near-dup graph: the
    exact transitive clustering a curation pipeline wants ("all
    near-dups of X"), vs. the greedy pairwise resolution of
    neardup_keep_longest. Iterative min-label propagation with pointer
    jumping (O(log d) driver-loop rounds of pure DataFrame ops); the
    oracle computes the same closure with a recursive CTE."""
    docs = load_par(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, band_size=4
    )
    return graph.connected_components(pairs, "id_a", "id_b")


@q(
    "neardup_keep_canonical",
    graph.cc_oracle_sql(_minhash_oracle_sql())
    + """
    SELECT comp, keep_id, n_members FROM (
      SELECT comp, cc.id AS keep_id,
             count(*) OVER (PARTITION BY comp) AS n_members,
             row_number() OVER (PARTITION BY comp
                                ORDER BY d.n_chars DESC, cc.id) AS rk
      FROM cc JOIN documents d ON d.doc_id = cc.id
    ) WHERE rk = 1
    """,
    "data",
)
def q_neardup_keep_canonical(spark, sf_dir):
    """Exact cluster-level near-dup resolution: per connected component
    of the LSH graph, keep the longest member (tie: smallest id). The
    precise counterpart of the greedy pairwise rule — a component keeps
    exactly ONE survivor however long the dup chain is."""
    docs = load_par(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, band_size=4
    )
    comps = graph.connected_components(pairs, "id_a", "id_b")
    return sampling.keep_canonical_per_component(
        comps, docs, id_col="doc_id", len_col="n_chars"
    )


@q(
    "corpus_mix_uniform",
    f"""
    WITH c AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
    m AS (SELECT min(n_s) AS n_min FROM c)
    SELECT doc_id AS id, d.lang AS source
    FROM documents d JOIN c USING (lang) CROSS JOIN m
    WHERE ({phash_sql("cast(doc_id as varchar)")} % 1000000)::HUGEINT
          * n_s::HUGEINT
          < n_min::HUGEINT * 1000000::HUGEINT
    """,
    "data",
)
def q_corpus_mix_uniform(spark, sf_dir):
    """Deterministic corpus mixing: every language downsampled to the
    smallest language's size by content-stable hash threshold (the
    testdata's lang distribution is skewed ~3.4x, so the rule is
    genuinely exercised). Integer-only keep rule (hash%1e6 * n_s <
    n_min * 1e6) — no float rates, so the oracle matches bit-for-bit;
    the corpus-side stage is map-only."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.mix_sources_uniform(docs, "lang", "doc_id")


@q(
    "quality_filter_stratified",
    """
    WITH f AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(text) AS nc
      FROM documents
    ), g AS (
      SELECT doc_id, lang, nc,
             len(toks) AS n,
             len(list_filter(toks, t -> t IN
                 ('the','a','an','and','or','of','to','in','is','it'))) AS n_stop,
             len(list_distinct(toks)) AS n_distinct
      FROM f
    ), scored AS (
      SELECT doc_id, lang,
             floor((least(n / 100.0, 1.0) * 0.25
                   + least(((nc - (n - 1)) / n) / 8.0, 1.0) * 0.25
                   + (1.0 - least(n_stop / n * 2, 1.0)) * 0.25
                   + n_distinct / n * 0.25) * 1e6 + 0.5) / 1e6 AS quality_score
      FROM g
    )
    SELECT id, lang, quality_score FROM (
      SELECT doc_id AS id, lang, quality_score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY quality_score DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM scored
    ) WHERE rk * 4 <= n_lang * 3
    """,
    "data",
)
def q_quality_filter_stratified(spark, sf_dir):
    """Quality-based corpus filtering, stratified by language: keep the
    top 75% of docs per language by composite quality score. Rank-based
    cutoff (rk*4 <= n*3, integer arithmetic) instead of a percentile
    threshold — no float interpolation at the boundary, so the kept set
    is deterministic and engine-portable. One shuffle on lang; both
    windows share it."""
    docs = load_par(spark, sf_dir, "documents")
    # single projection instead of attach-by-self-join — see
    # _curation_v3_pipeline for the rationale (same head shape)
    j = textops.quality_score(
        docs, "doc_id", "text", keep=("lang",)
    ).select("id", "lang", "quality_score")
    wp = Window.partitionBy("lang")
    w = wp.orderBy(F.col("quality_score").desc(), F.col("id"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .withColumn("n_lang", F.count("*").over(wp))
        .filter(F.col("rk") * 4 <= F.col("n_lang") * 3)
        .select("id", "lang", "quality_score")
    )


@q(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term FROM documents
    ), toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
    dfreq AS (
      SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks2)
      GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT id, term, tf, df, tfidf, rk FROM (
      SELECT tf.doc_id AS id, tf.term, tf.tf, dfreq.df,
             floor(tf.tf * n_docs / dfreq.df * 1000000 + 0.5) / 1000000 AS tfidf,
             cast(row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * n_docs / dfreq.df DESC, tf.term)
                  AS INTEGER) AS rk
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ) WHERE rk <= 3
    """,
    "data",
)
def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf with RAW
    inverse document frequency (N/df, no log): IEEE division is
    correctly rounded so the score is bit-identical cross-engine,
    whereas ln is not and would flake at rank boundaries. Postings
    explode + two map-side-partial hash aggs + term join + per-doc
    top-n window."""
    docs = load_par(spark, sf_dir, "documents")
    return textops.tfidf_top_terms(docs, "doc_id", "text", top_n=3)


@q(
    "bpe_pair_counts",
    """
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(tok)),
                                   i -> substr(tok, i, 2))) AS pair
      FROM tok WHERE length(tok) >= 2
    ),
    counted AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
    SELECT pair, n, cast(row_number() OVER (ORDER BY n DESC, pair) as INTEGER) AS rk
    FROM counted ORDER BY n DESC, pair LIMIT 30
    """,
    "data",
)
def q_bpe_pair_counts(spark, sf_dir):
    """The counting step of one BPE tokenizer-training iteration:
    corpus-wide adjacent character-pair frequencies, top 30 (the top
    pair is the next merge BPE would learn). Integer-only pipeline;
    shuffle bounded by the pair vocabulary, not the corpus."""
    docs = load_par(spark, sf_dir, "documents")
    return textops.bpe_pair_counts(docs, "text", top_n=30)


_EMB_PAIRS_035_SQL = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
               WHERE vec_id < 300)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round({_cos_sql("a.e", "b.e")}, 6) >= 0.35
"""


@q(
    "embedding_neardup_components",
    graph.cc_oracle_sql(_EMB_PAIRS_035_SQL) + " SELECT id, comp FROM cc",
    "data",
)
def q_embedding_neardup_components(spark, sf_dir):
    """Semantic dedup clusters: connected components over the
    embedding-cosine near-dup graph (exact bounded slice, cosine >=
    0.35 — the threshold that yields sparse multi-member clusters on
    this data). The same CC engine clusters the LSH/IVF candidate
    streams at scale; the oracle replays the closure recursively."""
    emb = load_par(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    from sonnerie_spark.operators.similarity import cosine

    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b")
    )
    return graph.connected_components(pairs, "id_a", "id_b")


@q(
    "continuous_rollup_roundtrip",
    """
    WITH base AS (
      SELECT event_type || '-' || lpad(cast(user_id as varchar), 4, '0') AS key,
             event_id * 1000 AS ts,
             round(value * 100)
               + CASE WHEN event_type = 'click' THEN 100000 ELSE 0 END AS v
      FROM events
    )
    SELECT key, ts - ts % 1000000 AS bucket_ts,
           count(*) AS n, sum(v) AS sum, min(v) AS min, max(v) AS max,
           sum(v) / count(*) AS mean
    FROM base GROUP BY key, bucket_ts
    """,
    "streaming",
    gate_only=True,
)
def q_continuous_rollup_roundtrip(spark, sf_dir):
    """Continuous aggregate lifecycle, oracle-checked end to end: build
    a source DB from events, full-build the hourly^W per-1e6ns rollup,
    commit an LWW overwrite of every click record (+100000), refresh
    INCREMENTALLY (only dirty buckets recomputed and upserted via the
    rollup DB's own LWW merge), and read the final state. The oracle is
    the direct one-shot aggregate over the post-overwrite truth, so the
    gate proves initial build + incremental invalidation + upsert all
    converge to it. Values are integer-valued doubles (round(value*100))
    so float summation is order-exact cross-engine."""

    from sonnerie_spark.db import Database
    from sonnerie_spark.streaming.rollup import ContinuousRollup

    base = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        (F.col("event_id") * 1000).cast("long").alias("ts"),
        F.round(F.col("value") * 100).alias("v"),
        F.col("event_type"),
    )

    def as_records(df):
        return df.select(
            "key",
            "ts",
            F.lit("F").alias("fmt"),
            F.lit(None).cast("array<long>").alias("v_long"),
            F.array(F.col("v")).alias("v_double"),
            F.lit(None).cast("array<string>").alias("v_str"),
            F.lit(None).cast("array<binary>").alias("v_bin"),
        )

    src = Database(spark, _gate_tmp("roll_gate_src_"))
    roll = ContinuousRollup(
        src, _gate_tmp("roll_gate_dst_"), interval_ns=1_000_000
    )
    src.commit_dataframe(as_records(base), check_duplicates=False)
    roll.refresh()  # full build
    run2 = base.filter(F.col("event_type") == "click").withColumn(
        "v", F.col("v") + F.lit(100000.0)
    )
    src.commit_dataframe(as_records(run2), check_duplicates=False)
    roll.refresh()  # incremental: only click-dirty buckets recomputed
    r = roll.read()
    return r.select(
        "key",
        "bucket_ts",
        "n",
        "sum",
        "min",
        "max",
        (F.col("sum") / F.col("n")).alias("mean"),
    )


@q(
    "corpus_mix_temperature",
    f"""
    WITH c AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY lang),
    m AS (SELECT min(n_g) AS n_min FROM c)
    SELECT doc_id AS id, d.lang AS grp
    FROM documents d JOIN c USING (lang) CROSS JOIN m
    WHERE ({phash_sql("cast(doc_id as varchar)")} % 1000000)::HUGEINT
          * ({phash_sql("cast(doc_id as varchar)")} % 1000000)::HUGEINT
          * n_g::HUGEINT
          < n_min::HUGEINT * 1000000000000::HUGEINT
    """,
    "data",
)
def q_corpus_mix_temperature(spark, sf_dir):
    """Temperature sampling at alpha=0.5 over languages (p ∝ sqrt(n)):
    the standard multilingual rebalance, with the sqrt folded into an
    exact squared integer comparison (decimal-widened) so the oracle
    hash-matches with no float boundary flakes."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.temperature_sample_sqrt(docs, "lang", "doc_id")


@q(
    "cohort_retention",
    """
    WITH ev AS (
      SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             date_trunc('day', ts) AS d
      FROM events
    ),
    cohort AS (SELECT user_id, min(d) AS c0 FROM ev GROUP BY user_id)
    SELECT strftime(c0, '%Y-%m-%d') AS cohort_day,
           date_diff('day', c0, d) AS day_offset,
           count(DISTINCT ev.user_id) AS n_users
    FROM ev JOIN cohort USING (user_id)
    WHERE date_diff('day', c0, d) BETWEEN 0 AND 7
    GROUP BY cohort_day, day_offset
    """,
    "analytics",
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-seen day, counted
    on each of the next 7 days they return. Two hash aggs (first-seen,
    distinct-per-cell) + one equi-join on user_id — the standard
    event-analytics staple, fully shuffle-bounded by user cardinality."""
    raw = load(spark, sf_dir, "events")
    ev = raw.select(
        "user_id",
        F.date_trunc("day", F.timestamp_micros(ts_us(raw))).alias("d"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("c0"))
    j = ev.join(cohort, "user_id").withColumn(
        "day_offset", F.datediff(F.col("d"), F.col("c0")).cast("long")
    )
    return (
        j.filter(F.col("day_offset").between(0, 7))
        .groupBy(
            F.date_format("c0", "yyyy-MM-dd").alias("cohort_day"), "day_offset"
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@q(
    "funnel_conversion",
    """
    WITH s AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(epoch_us(ts)) AS t2
      FROM events e JOIN s USING (user_id)
      WHERE event_type = 'click' AND epoch_us(ts) > t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(ts)) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND epoch_us(ts) > t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_click_after,
           (SELECT count(*) FROM p) AS n_purchase_after
    """,
    "analytics",
)
def q_funnel_conversion(spark, sf_dir):
    """Ordered funnel: signup -> later click -> later purchase, counted
    per stage. Each stage is one filtered agg plus an equi-join against
    the previous stage's per-user min — user-cardinality shuffles only,
    no window over the raw event stream."""
    raw = load(spark, sf_dir, "events")
    ev = raw.select("user_id", "event_type", ts_us(raw).alias("t"))
    # Each stage is referenced twice (the next stage's join + its own
    # final count), so the unmaterialized chain re-evaluated s twice
    # and c twice — a recompute triangle that costs two extra filtered
    # event scans per query at corpus scale. Size-conditional
    # boundaries give the stages the composite spill shape above the
    # breakeven and stay pure recompute at gate scale (guide §2.4).
    spills: list = []
    s = _boundary(
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1")),
        spills,
        "funnel_s",
        sf_dir,
        table="events",
    )
    c = _boundary(
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("t") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2")),
        spills,
        "funnel_c",
        sf_dir,
        table="events",
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    out = (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )
    return _finish_composite(out, spills) if spills else out


@q(
    "repeated_spans",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, unnest(range(greatest(len(t) - 7, 0))) AS pos, t
      FROM toks WHERE len(t) >= 8
    ),
    hashed AS (
      SELECT doc_id AS id, pos,
             {phash_sql("array_to_string(t[pos+1:pos+8], ' ')")} AS span_h
      FROM spans
    ),
    freq AS (
      SELECT span_h, count(*) AS df
      FROM (SELECT DISTINCT id, span_h FROM hashed)
      GROUP BY span_h HAVING count(*) >= 2
    )
    SELECT id, pos, hashed.span_h, df FROM hashed JOIN freq USING (span_h)
    """,
    "data",
)
def q_repeated_spans(spark, sf_dir):
    """Span-level duplication map: every position of an 8-token span
    shared by >= 2 distinct documents — the counting core of substring
    dedup (boilerplate removal between the exact and near-dup passes).
    One span-occurrence stream + one map-side-partial df agg + a join
    back; no pair enumeration, so no quadratic path exists."""
    docs = load_par(spark, sf_dir, "documents")
    r = textops.repeated_spans(
        docs, "doc_id", "text", k=8, min_df=2, materialize=True
    )
    return r.select("id", F.col("pos").cast("long"), "span_h", "df")


@q(
    "lsh_index_incremental",
    _minhash_oracle_sql(),
    "data",
    gate_only=True,
)
def q_lsh_index_incremental(spark, sf_dir):
    """The persistent LshIndex under the correctness gate: documents
    arrive as two batches (even ids, then odd ids) through the
    applied-batch ledger (``batch_id=``), and the FIRST batch is then
    RE-DELIVERED (the at-least-once foreachBatch retry, arriving LATE —
    after the second batch landed); the union of every add() output,
    replay included, must equal the one-shot LSH pair set over the
    whole corpus — the oracle IS the one-shot SQL. Proves the
    incremental index neither misses cross-batch collisions nor
    re-emits stale ones, and that a replayed batch skips the append
    (its extra late-replay pairs are re-emissions already in the
    one-shot set, never fabrications)."""

    docs = load_par(spark, sf_dir, "documents")
    idx = dedup.LshIndex(spark, _gate_tmp("lsh_gate_"))
    even = docs.filter(F.col("doc_id") % 2 == 0)
    p1 = idx.add(even, "doc_id", "text", batch_id="even")
    p2 = idx.add(
        docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text",
        batch_id="odd",
    )
    p1_replay = idx.add(even, "doc_id", "text", batch_id="even")
    return (
        p1.unionByName(p2)
        .unionByName(p1_replay)
        .distinct()
        .select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))
    )


def _dd_store_oracle() -> str:
    from sonnerie_spark.operators.sketch import dd_sketch_grouped_sql

    return dd_sketch_grouped_sql(
        "event_type", "value", "events", relative_accuracy=0.01
    )


@q(
    "dd_store_roundtrip",
    _dd_store_oracle(),
    "streaming",
    gate_only=True,
)
def q_dd_store_roundtrip(spark, sf_dir):
    """The persistent DdStore under the correctness gate: events arrive
    as three disjoint batches through add(batch_id, ...), with one
    batch REPLAYED (the at-least-once retry DD's sum-merge must not
    double-count — the ledger makes it a no-op); the final store
    content must equal the one-shot grouped sketch over the whole
    table, whose DuckDB mirror IS the oracle. Proves the
    exactly-once merge, the generation swap, and the materialized read
    end-to-end."""

    from sonnerie_spark.operators.sketch import DdStore

    ev = load_par(spark, sf_dir, "events")
    store = DdStore(
        spark, _gate_tmp("dd_gate_"), relative_accuracy=0.01
    )
    for i in range(3):
        batch = ev.filter(F.col("event_id") % 3 == i)
        assert store.add(i, batch, "event_type", "value") is True
    # at-least-once delivery: the retry of batch 1 must be a no-op
    assert store.add(1, ev.filter(F.col("event_id") % 3 == 1),
                     "event_type", "value") is False
    return store.sketches()


def _bloom_store_oracle() -> str:
    from sonnerie_spark.operators.sketch import bloom_sketch_sql

    return bloom_sketch_sql(
        "cast(user_id AS varchar)", "events", num_bits=4096, num_hashes=4
    )


@q(
    "bloom_store_roundtrip",
    _bloom_store_oracle(),
    "streaming",
    gate_only=True,
)
def q_bloom_store_roundtrip(spark, sf_dir):
    """The persistent BloomStore under the correctness gate: event
    users arrive as three disjoint batches through add(), with one
    batch REPLAYED (per-word OR is idempotent — HllStore's replay
    argument, so no ledger); the final word table must equal the
    one-shot Bloom filter over the whole table, whose DuckDB mirror IS
    the oracle. Proves the OR-merge, the generation swap, and the
    parameter persistence end-to-end (the store reopens mid-gate and
    must adopt the persisted num_bits)."""

    from sonnerie_spark.operators.sketch import BloomStore

    ev = load_par(spark, sf_dir, "events")
    path = _gate_tmp("bloom_gate_")
    store = BloomStore(spark, path, num_bits=4096, num_hashes=4)
    val = F.col("user_id").cast("string")
    for i in range(3):
        store.add(ev.filter(F.col("event_id") % 3 == i), val)
    # at-least-once delivery: replay of batch 1 must be a no-op
    BloomStore(spark, path).add(ev.filter(F.col("event_id") % 3 == 1), val)
    return store.sketch()


@q(
    "rollup_cascade_roundtrip",
    """
    WITH base AS (
      SELECT event_type || '-' || lpad(cast(user_id as varchar), 4, '0') AS key,
             event_id * 1000 AS ts,
             round(value * 100) AS v
      FROM events
    )
    SELECT key, ts - ts % 10000000 AS bucket_ts,
           count(*) AS n, sum(v) AS sum, min(v) AS min, max(v) AS max
    FROM base GROUP BY key, bucket_ts
    """,
    "streaming",
    gate_only=True,
)
def q_rollup_cascade_roundtrip(spark, sf_dir):
    """Hierarchical rollup under the gate: fine rollup (1e6 ns) built
    from the source, coarse rollup (1e7 ns) cascaded FROM the fine one
    (aggregate-merge, never re-reading raw data); the oracle is the
    direct coarse aggregate over the raw events, so the gate proves the
    reaggregation identity end-to-end."""

    from sonnerie_spark.db import Database
    from sonnerie_spark.streaming.rollup import ContinuousRollup

    base = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        (F.col("event_id") * 1000).cast("long").alias("ts"),
        F.round(F.col("value") * 100).alias("v"),
    )
    src = Database(spark, _gate_tmp("casc_src_"))
    src.commit_dataframe(
        base.select(
            "key",
            "ts",
            F.lit("F").alias("fmt"),
            F.lit(None).cast("array<long>").alias("v_long"),
            F.array(F.col("v")).alias("v_double"),
            F.lit(None).cast("array<string>").alias("v_str"),
            F.lit(None).cast("array<binary>").alias("v_bin"),
        ),
        check_duplicates=False,
    )
    fine = ContinuousRollup(
        src, _gate_tmp("casc_fine_"), interval_ns=1_000_000
    )
    fine.refresh()
    coarse = ContinuousRollup.cascade(
        fine, _gate_tmp("casc_coarse_"), interval_ns=10_000_000
    )
    coarse.refresh()
    return coarse.read().select("key", "bucket_ts", "n", "sum", "min", "max")


@q(
    "corpus_mix_weighted",
    f"""
    WITH w(src, wt) AS (VALUES ('de', 2), ('en', 1), ('es', 2), ('fr', 3), ('zh', 1)),
    c AS (
      SELECT lang AS src, count(*) AS n_s FROM documents GROUP BY lang
    ),
    cw AS (SELECT src, n_s, wt FROM c JOIN w USING (src)),
    m AS (
      SELECT n_s AS n_m, wt AS w_m FROM cw
      ORDER BY n_s * 1.0 / wt, src LIMIT 1
    )
    SELECT doc_id AS id, d.lang AS source
    FROM documents d JOIN cw ON cw.src = d.lang CROSS JOIN m
    WHERE ({phash_sql("cast(doc_id as varchar)")} % 1000000)::HUGEINT
          * n_s::HUGEINT * w_m::HUGEINT
          < 1000000::HUGEINT * n_m::HUGEINT * wt::HUGEINT
    """,
    "data",
)
def q_corpus_mix_weighted(spark, sf_dir):
    """Corpus mixing to explicit target proportions (de:2 en:1 es:2 fr:3
    zh:1): the largest corpus with exactly that mix, keep decisions by
    content-stable hash under a pure-integer rule (decimal/HUGEINT
    widened), binding source chosen deterministically."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.mix_sources_weighted(
        docs, "lang", "doc_id", {"de": 2, "en": 1, "es": 2, "fr": 3, "zh": 1}
    )


def _quality_keep_sql() -> str:
    """CTE chain ending in keepq(id, lang, n_chars): top-75%-quality
    docs per language (the quality_filter_stratified rule)."""
    return """
    qf AS (
      SELECT doc_id, lang, n_chars,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(text) AS nc
      FROM documents
    ), qg AS (
      SELECT doc_id, lang, n_chars, nc,
             len(toks) AS n,
             len(list_filter(toks, t -> t IN
                 ('the','a','an','and','or','of','to','in','is','it'))) AS n_stop,
             len(list_distinct(toks)) AS n_distinct
      FROM qf
    ), qscored AS (
      SELECT doc_id, lang, n_chars,
             floor((least(n / 100.0, 1.0) * 0.25
                   + least(((nc - (n - 1)) / n) / 8.0, 1.0) * 0.25
                   + (1.0 - least(n_stop / n * 2, 1.0)) * 0.25
                   + n_distinct / n * 0.25) * 1e6 + 0.5) / 1e6 AS quality_score
      FROM qg
    ), keepq AS (
      SELECT id, lang, n_chars FROM (
        SELECT doc_id AS id, lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY quality_score DESC, doc_id) AS rk,
               count(*) OVER (PARTITION BY lang) AS n_lang
        FROM qscored
      ) WHERE rk * 4 <= n_lang * 3
    )
    """


def _curation_v2_oracle() -> str:
    ph = phash_sql("cast(id as varchar)")
    u = f"({ph} % 1000000)"
    # full-corpus LSH pairs restricted to the quality-kept set ==
    # LSH pairs computed on the kept set (signatures are per-doc)
    mh = _minhash_oracle_sql()
    mh_body = mh.strip()
    assert mh_body.startswith("WITH ")
    return (
        "WITH RECURSIVE "
        + _quality_keep_sql().strip().rstrip()
        + ", "
        + mh_body[len("WITH ") :].split("SELECT DISTINCT")[0]
        + """,
    allpairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM allpairs
      JOIN keepq ka ON ka.id = id_a JOIN keepq kb ON kb.id = id_b
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM edges)
      UNION
      SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
    ),
    cc AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
    canon AS (
      SELECT comp, id AS keep_id FROM (
        SELECT comp, cc.id,
               row_number() OVER (PARTITION BY comp
                                  ORDER BY k.n_chars DESC, cc.id) AS rk
        FROM cc JOIN keepq k USING (id)
      ) WHERE rk = 1
    ),
    removed AS (
      SELECT cc.id FROM cc JOIN canon USING (comp) WHERE cc.id <> canon.keep_id
    ),
    survivors AS (
      SELECT id, lang FROM keepq WHERE id NOT IN (SELECT id FROM removed)
    ),
    sc AS (SELECT lang, count(*) AS n_g FROM survivors GROUP BY lang),
    sm AS (SELECT min(n_g) AS n_min FROM sc),
    mixed AS (
      SELECT id, s.lang FROM survivors s JOIN sc USING (lang) CROSS JOIN sm
      WHERE """
        + f"{u}::HUGEINT * {u}::HUGEINT * n_g::HUGEINT < n_min::HUGEINT * 1000000000000::HUGEINT"
        + f"""
    )
    SELECT id, lang,
           {ph} % 100 AS bucket,
           CASE WHEN {ph} % 100 < 80 THEN 'train'
                WHEN {ph} % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM mixed
    """
    )


def _curation_v3_oracle() -> str:
    """v2 with a SemDeDup stage between cluster dedup and mixing: the
    surviving docs' embeddings are clustered and within-cluster cosine
    near-dups dropped (higher-priority-witness rule, tau=0.25) before
    the temperature mix. Assembled from the v2 oracle by swapping its
    mixing tail; centroid seeds are the surviving ids < 8, restricted
    identically on both engines."""
    base = _curation_v2_oracle()
    marker = "sc AS (SELECT lang, count(*) AS n_g FROM survivors GROUP BY lang)"
    cut = base.index(marker)
    head = base[:cut]
    ph = phash_sql("cast(id as varchar)")
    u = f"({ph} % 1000000)"
    return (
        head
        + f"""sv_e AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE vec_id IN (SELECT id FROM survivors)
    ),
    sem_c AS (
      SELECT vec_id AS cid, e AS ce
      FROM (SELECT vec_id, e FROM sv_e ORDER BY vec_id LIMIT 8)
    ),
    sem_scored AS (
      SELECT sv_e.vec_id, sem_c.cid,
             round({_cos_sql("sv_e.e", "sem_c.ce")}, 6) AS cos
      FROM sv_e CROSS JOIN sem_c
    ),
    sem_r AS (
      SELECT vec_id, cid, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid ASC) AS rn
      FROM sem_scored
    ),
    sem_assign AS (SELECT vec_id, cid, cos AS ccos FROM sem_r WHERE rn = 1),
    sem_dropped AS (
      SELECT DISTINCT b.vec_id AS id
      FROM sem_assign a
      JOIN sem_assign b ON a.cid = b.cid
       AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
      JOIN sv_e va ON va.vec_id = a.vec_id
      JOIN sv_e vb ON vb.vec_id = b.vec_id
      WHERE round({_cos_sql("va.e", "vb.e")}, 6) >= 0.25
    ),
    final AS (
      SELECT id, lang FROM survivors
      WHERE id NOT IN (SELECT id FROM sem_dropped)
    ),
    sc AS (SELECT lang, count(*) AS n_g FROM final GROUP BY lang),
    sm AS (SELECT min(n_g) AS n_min FROM sc),
    mixed3 AS (
      SELECT id, f.lang FROM final f JOIN sc USING (lang) CROSS JOIN sm
      WHERE {u}::HUGEINT * {u}::HUGEINT * n_g::HUGEINT < n_min::HUGEINT * 1000000000000::HUGEINT
    )
    SELECT id, lang,
           {ph} % 100 AS bucket,
           CASE WHEN {ph} % 100 < 80 THEN 'train'
                WHEN {ph} % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM mixed3
    """
    )


def _curation_v3_pipeline(spark, sf_dir, docs, spills=None):
    """The v3 stage chain over an arbitrary document frame — shared by
    corpus_curation_v3 (raw corpus), corpus_curation_v4 (the
    bloom-decontaminated corpus) and corpus_curation_v5 (decontaminated
    + classifier-filtered). `spills` lets the caller's own stage
    boundaries (the flagged-id list) share this pipeline's cleanup."""
    spills = [] if spills is None else spills
    # Features ride the same projection as the payload columns instead
    # of the former attach-by-self-join (docs ⋈ quality_score(docs) on
    # id): Catalyst evaluated the subtree below that join TWICE (for
    # v4/v5 that was the bloom anti-join + classifier fold per side)
    # plus a broadcast build. Same rows, same values, one evaluation.
    base = textops.quality_score(
        docs, "doc_id", "text", keep=("lang", "n_chars", "text")
    ).select("id", "lang", "n_chars", "text", "quality_score")
    wp = Window.partitionBy("lang")
    w = wp.orderBy(F.col("quality_score").desc(), F.col("id"))
    # Three downstream consumers (pair stream, canonical keep, survivor
    # anti-join) would each recompute quality + the rank window —
    # spill the kept corpus once (see _spill_boundary for why this is
    # a parquet write, not persist()).
    keepq = _spill_boundary(
        base.withColumn("rk", F.row_number().over(w))
        .withColumn("n_lang", F.count("*").over(wp))
        .filter(F.col("rk") * 4 <= F.col("n_lang") * 3)
        .select("id", "lang", "n_chars", "text"),
        spills,
        "keepq",
    )
    pairs = dedup.minhash_lsh_pairs(
        keepq, "id", "text", k=3, num_hashes=16, band_size=4
    )
    comps = graph.connected_components(pairs, "id_a", "id_b")
    canon = sampling.keep_canonical_per_component(
        comps, keepq, id_col="id", len_col="n_chars"
    )
    removed = (
        comps.join(canon, "comp")
        .filter(F.col("id") != F.col("keep_id"))
        .select("id")
    )
    # SemDeDup references the survivor set from BOTH sides of its pair
    # probe plus the final keep join, and its embedding join feeds FIVE
    # consumers (the seed collect, semdedup's three references through
    # its pair probe, and the drop anti-join) — unmaterialized,
    # Catalyst re-runs quality + LSH + CC + the embedding join per
    # reference (guide §2.4). ONE spilled frame serves both stage
    # boundaries (the former separate survivors/surv_emb spills paid an
    # extra write job + re-read + footer pass for the same bytes): the
    # embedding rides a LEFT join — docs without an embedding row keep
    # a NULL vector and still flow to the final keep (embeddings cover
    # a subset of documents at some SFs; the 1:1 id join makes left +
    # not-null filter exactly the old inner join). This spill write is
    # also keepq's LAST consumer, so after it the gate holds no
    # corpus-sized state anywhere.
    emb = load_par(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    survivors = _spill_boundary(
        keepq.select("id", "lang")
        .join(removed, "id", "left_anti")
        .join(emb, "id", "left"),
        spills,
        "survivors",
    )
    surv_emb = survivors.filter(F.col("embedding").isNotNull()).select(
        "id", "embedding"
    )
    # centroid seeds must come from the SURVIVING set (ids < 8 may all
    # have been dropped upstream): the 8 smallest surviving ids, a
    # bounded dimension-data collect mirrored by the oracle's LIMIT 8
    seeds = surv_emb.orderBy("id").limit(8).collect()
    cents = ([list(r.embedding) for r in seeds], [int(r.id) for r in seeds])
    kept_sem = similarity.semdedup(
        surv_emb,
        id_col="id",
        vec_col="embedding",
        tau=0.25,
        centroids=cents,
        # materialize the centroid-assignment fold once: unbounded, its
        # three references (both probe sides + the keep anti-join) each
        # re-ran the fold over the survivors spill (guide §2.4)
        boundary=lambda d, t: _spill_boundary(d, spills, t),
    ).select("id")
    # drop only PROVEN near-duplicates: docs without an embedding row
    # (embeddings cover a subset of documents at some SFs) pass through
    # — an inner join on the kept set would silently discard them
    sem_dropped = surv_emb.select("id").join(kept_sem, "id", "left_anti")
    # temperature_sample_sqrt references its input THREE times (group
    # counts, the min-count dim, and the kept stream); unmaterialized,
    # each reference re-ran the semdedup pair probe — the composite's
    # single most expensive stage — plus both anti-joins. Spill the
    # final survivor set once (guide §2.4).
    final = _spill_boundary(
        survivors.select("id", "lang").join(sem_dropped, "id", "left_anti"),
        spills,
        "final",
    )
    mixed = sampling.temperature_sample_sqrt(final, "lang", "id").select(
        "id", F.col("grp").alias("lang")
    )
    bucket = F.pmod(phash(F.col("id").cast("string")), F.lit(100))
    out = mixed.select(
        "id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )
    return _finish_composite(out, spills)


@q("corpus_curation_v3", _curation_v3_oracle(), "data")
def q_corpus_curation_v3(spark, sf_dir):
    """The flagship composite extended in r6 with the semantic stage:
    quality gate -> MinHash-LSH near-dup clustering -> keep longest
    per cluster -> SEMDEDUP over the survivors' embeddings
    (cluster-bounded cosine near-dup drop, tau=0.25 — the
    embedding-space pass that catches paraphrases lexical dedup
    misses) -> temperature mix -> hash split. Every stage is the
    oracle-gated operator it reuses; the doc corpus joins its
    embedding table 1:1 on id. Plan adds one equi-join pair probe and
    a broadcast of the survivor ids — no new corpus shuffle class."""
    docs = load_par(spark, sf_dir, "documents")
    return _curation_v3_pipeline(spark, sf_dir, docs)


def _curation_v4_oracle() -> str:
    """v3 over the bloom-decontaminated corpus: prepend the
    decontaminate_bloom CTE network (prefixed dec_*), define
    docs_clean = documents minus any doc with a probable shared
    8-gram, and point the v3 body's two corpus reads at it (the dec
    CTEs' own reads of the RAW corpus are prepended after the
    substitution, so they are untouched)."""
    from sonnerie_spark.operators.sketch import (
        bloom_probe_sql,
        bloom_sketch_sql,
    )

    nb = 1 << 16
    sk = bloom_sketch_sql(
        "shingle",
        "(SELECT shingle FROM dec_sh WHERE doc_id % 97 = 0)",
        num_bits=nb,
        num_hashes=4,
    )
    probe = bloom_probe_sql(
        "id, v",
        "(SELECT doc_id AS id, shingle AS v FROM dec_sh)",
        num_bits=nb,
        num_hashes=4,
    )
    # MATERIALIZED + NOT EXISTS: DuckDB inlines plain CTEs per
    # reference and NOT IN defeats the hash anti-join — the naive form
    # measured 288 s at sf0.01 vs 10 s for this one (same 111 rows)
    dec = f"""dec_sh AS MATERIALIZED ({shingles_sql(8)}),
    dec_sk AS MATERIALIZED ({sk}),
    dec_probe AS ({probe}),
    dec_flag AS MATERIALIZED (
      SELECT DISTINCT id FROM (
        SELECT id, v,
               bool_and(dec_sk.bits IS NOT NULL
                        AND (dec_sk.bits & dec_probe.mask) <> 0) AS might
        FROM dec_probe LEFT JOIN dec_sk USING (word_idx)
        GROUP BY id, v
      ) WHERE might
    ),
    docs_clean AS MATERIALIZED (
      SELECT d.* FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM dec_flag f WHERE f.id = d.doc_id)
    ),
    """
    raw = _curation_v3_oracle()
    # exactly the two corpus reads (quality head + the 3-gram shingle
    # CTE) may be repointed; a future v3 edit that adds or rephrases a
    # corpus read must fail HERE, not drift the v4 oracle silently
    assert raw.count("FROM documents") == 2, raw.count("FROM documents")
    v3 = raw.replace("FROM documents", "FROM docs_clean")
    marker = "WITH RECURSIVE "
    assert v3.startswith(marker)
    return marker + dec + v3[len(marker):]


@q("corpus_curation_v4", _curation_v4_oracle(), "data")
def q_corpus_curation_v4(spark, sf_dir):
    """The r8 flagship composite: BLOOM DECONTAMINATION first, then
    the full v3 chain over the clean corpus — the published pipeline
    order (strip eval-set material before anything else touches it).
    The decontamination stage is the oracle-gated decontaminate_bloom
    operator verbatim (fixed-size filter of the pseudo-eval set's
    8-gram shingles, map-only broadcast probe, no false negatives —
    over-flagging only ever removes MORE, the safe direction); its
    deterministic false positives at sf0.1 make the v4 survivor set
    strictly differ from v3's, so the gate proves the composition, not
    just the stages. Plan adds one corpus shingle explode + k
    broadcast word-table joins + one distinct-flag broadcast anti-join
    before the quality gate — no new corpus shuffle class."""
    docs = load_par(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    # the flagged-id list is tiny but its lineage (corpus shingle
    # explode + k word-table probes) is the expensive part, and `clean`
    # feeds BOTH head branches of the v3 chain (quality scoring and the
    # base join) before keepq's spill boundary — spill the ids so the
    # probe runs once, and the recomputed part of `clean` is just
    # scan + broadcast anti-join (v3's own recompute class)
    spills: list = []
    flagged = _spill_boundary(
        textops.decontaminate_bloom(
            docs, bench, k=8, num_bits=1 << 16, num_hashes=4
        ).select("id"),
        spills,
        "flagged",
    )
    clean = docs.join(
        flagged, docs["doc_id"] == flagged["id"], "left_anti"
    )
    return _curation_v3_pipeline(spark, sf_dir, clean, spills)


def _curation_v5_oracle() -> str:
    """v4 with the model-based quality filter between decontamination
    and the v3 chain (the DCLM order: the classifier IS the quality
    gate's front line): insert the hashed-classifier CTEs after
    docs_clean and point the v3 body's two corpus reads at docs_cls.
    Spliced from the v4 oracle exactly as v4 splices v3, with the same
    drift guards — a future v4 edit that changes how many reads the v3
    body makes of docs_clean must fail HERE."""
    raw = _curation_v4_oracle()
    # the v3 body's two repointed reads; docs_clean's own definition
    # reads `FROM documents d`, so it is untouched by this count
    assert raw.count("FROM docs_clean") == 2, raw.count("FROM docs_clean")
    v4 = raw.replace("FROM docs_clean", "FROM docs_cls")
    anchor = """docs_clean AS MATERIALIZED (
      SELECT d.* FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM dec_flag f WHERE f.id = d.doc_id)
    ),
    """
    assert anchor in v4
    cls = f"""cls_tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM docs_clean
    ),
    cls_s AS MATERIALIZED (
      SELECT doc_id,
             sum(({phash_salted_sql("tok", 97)} % 2001) - 1000) AS ssum,
             count(*) AS n
      FROM cls_tok GROUP BY doc_id
    ),
    docs_cls AS MATERIALIZED (
      SELECT d.* FROM docs_clean d
      JOIN cls_s s ON s.doc_id = d.doc_id
      WHERE floor(s.ssum * 1000.0 / greatest(s.n, 1)) >= 0
    ),
    """
    return v4.replace(anchor, anchor + cls, 1)


@q("corpus_curation_v5", _curation_v5_oracle(), "data")
def q_corpus_curation_v5(spark, sf_dir):
    """The r9 flagship composite: bloom decontamination, then the
    MODEL-BASED quality filter (the DCLM order — the linear classifier
    is the quality gate's front line), then the full v3 chain. The
    classifier stage is `classifier_milli` applied as a bare predicate
    on the clean corpus — a map-only token-array fold, NO new join, NO
    new shuffle (pinned equal to the oracle-gated classifier_score by
    pytest); at threshold 0 it removes a deterministic ~17% of docs,
    so v5's survivor set strictly differs from v4's and the gate
    proves the composition. Everything downstream is the audited v4
    machinery verbatim."""
    docs = load_par(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    spills: list = []
    flagged = _spill_boundary(
        textops.decontaminate_bloom(
            docs, bench, k=8, num_bits=1 << 16, num_hashes=4
        ).select("id"),
        spills,
        "flagged",
    )
    clean = docs.join(
        flagged, docs["doc_id"] == flagged["id"], "left_anti"
    )
    kept = clean.filter(textops.classifier_milli(F.col("text")) >= 0)
    return _curation_v3_pipeline(spark, sf_dir, kept, spills)


@q("corpus_curation_v2", _curation_v2_oracle(), "data")
def q_corpus_curation_v2(spark, sf_dir):
    """The round-4 flagship composite: the full training-data curation
    flow using the EXACT cluster-level machinery — per-language quality
    gate (rank-based top 75%) -> MinHash-LSH pairs on the kept set ->
    connected-components clustering -> keep the longest member per
    cluster -> temperature mix (alpha=0.5) across languages ->
    deterministic hash split. Every stage is the oracle-gated operator
    it reuses; the composition itself is what this gate proves. Plan:
    quality+rank (one lang shuffle), bucketed LSH pair stream, O(log d)
    CC rounds, two tiny broadcast dims, map-only mix+split."""
    docs = load_par(spark, sf_dir, "documents")
    # single projection instead of attach-by-self-join — see
    # _curation_v3_pipeline for the rationale (same head shape)
    base = textops.quality_score(
        docs, "doc_id", "text", keep=("lang", "n_chars", "text")
    ).select("id", "lang", "n_chars", "text", "quality_score")
    wp = Window.partitionBy("lang")
    w = wp.orderBy(F.col("quality_score").desc(), F.col("id"))
    # Three downstream consumers (pair stream, canonical keep,
    # survivor anti-join) re-derive the kept corpus; whether that
    # boundary is WORTH materializing is size-dependent — the r11 A/B
    # showed the unconditional spill DOUBLING this (smallest) composite
    # at gate scale, so it now spills only above the measured breakeven
    # (see _boundary / _SPILL_MIN_SOURCE_ROWS; at 100 TB it always
    # spills — the columnar stage-boundary shape).
    spills: list = []
    keepq = _boundary(
        base.withColumn("rk", F.row_number().over(w))
        .withColumn("n_lang", F.count("*").over(wp))
        .filter(F.col("rk") * 4 <= F.col("n_lang") * 3)
        .select("id", "lang", "n_chars", "text"),
        spills,
        "keepq",
        sf_dir,
        # the MinHash signature fold reads this boundary (see _boundary:
        # unspread it ran single-task, 5.07 s of the composite)
        spread=True,
    )
    pairs = dedup.minhash_lsh_pairs(keepq, "id", "text", k=3, num_hashes=16, band_size=4)
    comps = graph.connected_components(pairs, "id_a", "id_b")
    canon = sampling.keep_canonical_per_component(
        comps, keepq, id_col="id", len_col="n_chars"
    )
    removed = (
        comps.join(canon, "comp")
        .filter(F.col("id") != F.col("keep_id"))
        .select("id")
    )
    # temperature_sample_sqrt references its input three times; above
    # the breakeven the survivor set gets the same size-conditional
    # boundary as keepq (below it, recompute of the broadcast anti-join
    # stays cheaper than the spill round-trip — the r11 v2 lesson).
    survivors = _boundary(
        keepq.select("id", "lang").join(removed, "id", "left_anti"),
        spills,
        "survivors",
        sf_dir,
    )
    mixed = sampling.temperature_sample_sqrt(survivors, "lang", "id").select(
        "id", F.col("grp").alias("lang")
    )
    bucket = F.pmod(phash(F.col("id").cast("string")), F.lit(100))
    out = mixed.select(
        "id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )
    return _finish_composite(out, spills)


@q(
    "sql_over_view",
    """
    WITH base AS (
      SELECT event_type || '-' || lpad(cast(user_id as varchar), 4, '0') AS key,
             event_id * 1000 AS ts,
             round(value * 100) AS v
      FROM events
    )
    SELECT key, count(*) AS n,
           sum(v) AS total, min(ts) AS first_ts, max(ts) AS last_ts
    FROM base GROUP BY key
    """,
    "parity",
    gate_only=True,
)
def q_sql_over_view(spark, sf_dir):
    """The SQL layer end-to-end: events committed into a Database, the
    merged view registered with create_view(), and plain spark.sql()
    aggregating over it — checked against the direct aggregate of the
    raw data. Proves a SQL-only user gets the LWW/delete-filtered truth
    through a temp view with no DataFrame code."""
    import os

    from sonnerie_spark.db import Database

    base = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        (F.col("event_id") * 1000).cast("long").alias("ts"),
        F.round(F.col("value") * 100).alias("v"),
    )
    db = Database(spark, _gate_tmp("sqlview_gate_"))
    db.commit_dataframe(
        base.select(
            "key",
            "ts",
            F.lit("F").alias("fmt"),
            F.lit(None).cast("array<long>").alias("v_long"),
            F.array(F.col("v")).alias("v_double"),
            F.lit(None).cast("array<string>").alias("v_str"),
            F.lit(None).cast("array<binary>").alias("v_bin"),
        ),
        check_duplicates=False,
    )
    view = f"tsdb_{os.getpid()}"
    db.create_view(view)
    return spark.sql(
        f"""
        SELECT key, count(*) AS n,
               sum(v_double[0]) AS total,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM {view} GROUP BY key
        """
    )


@q(
    "embedding_quantize_int8",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    m AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS mx
      FROM v
    )
    SELECT vec_id AS id,
           mx / 127.0 AS scale,
           array_to_string(
             CASE WHEN mx = 0
                  THEN list_transform(e, x -> 0)
                  ELSE list_transform(e, x -> cast(round(x * 127.0 / mx) as int))
             END, ',') AS qvec
    FROM m
    """,
    "data",
)
def q_embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization (scale = max|x|/127): the
    4x storage/bandwidth compression applied before ANN indexing at
    corpus scale. Map-only; engine-exact because max/abs/divide are
    correctly-rounded IEEE ops and both engines round halves away from
    zero. The gate serializes qvec to a comma-joined string so every
    output column is a scalar the correctness driver can canonicalize
    (its pandas sort cannot order array cells); quantize_int8 itself
    still returns the native array<int>."""
    emb = load_par(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    from sonnerie_spark.operators.similarity import quantize_int8

    qdf = quantize_int8(emb, "vec_id", "embedding")
    return qdf.select(
        "id",
        "scale",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec"),
    )


@q(
    "embedding_topk_int8",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    m AS (
      SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS mx FROM v
    ),
    q AS (
      SELECT vec_id,
             CASE WHEN mx = 0
                  THEN list_transform(e, x -> 0)
                  ELSE list_transform(e, x -> cast(round(x * 127.0 / mx) as int))
             END AS qv
      FROM m
    )
    SELECT probe_id, id, idot, rk FROM (
      SELECT p.vec_id AS probe_id, c.vec_id AS id,
             cast(list_sum(list_transform(range(1, len(p.qv) + 1),
                  i -> cast(p.qv[i] as bigint) * c.qv[i])) as bigint) AS idot,
             cast(row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY list_sum(list_transform(range(1, len(p.qv) + 1),
                        i -> cast(p.qv[i] as bigint) * c.qv[i])) DESC, c.vec_id
             ) AS INTEGER) AS rk
      FROM q p JOIN q c ON p.vec_id < 5 AND c.vec_id <> p.vec_id
    ) WHERE rk <= 5
    """,
    "data",
)
def q_embedding_topk_int8(spark, sf_dir):
    """Top-5 neighbours per probe by INT8 dot product over the quantized
    vectors — the downstream payoff of quantization: ranking is pure
    64-bit integer arithmetic, exact in any order and any engine (no
    float-tie flakiness at all). Probes broadcast against one scan of
    the quantized corpus."""
    from sonnerie_spark.operators.similarity import quantize_int8

    emb = load_par(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = quantize_int8(emb, "vec_id", "embedding")
    probes = q.filter(F.col("id") < 5).select(
        F.col("id").alias("probe_id"), F.col("qvec").alias("pv")
    )
    cand = q.select(F.col("id"), F.col("qvec").alias("cv"))
    idot = F.aggregate(
        F.zip_with("pv", "cv", lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("idot").desc(), F.col("id"))
    return (
        F.broadcast(probes)
        .join(cand, F.col("probe_id") != F.col("id"))
        .withColumn("idot", idot)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("probe_id", "id", "idot", "rk")
    )


_PQ_SQL_CTES = """
    sv AS (
      SELECT vec_id,
             list_transform(e, x -> cast(round(x * 10000000) as bigint)) AS se
      FROM v
    ),
    cbs AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
             list_transform(e, x -> cast(round(x * 10000000) as bigint)) AS ce
      FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 16)
    ),
    d AS (
      SELECT sv.vec_id, r.s, cbs.code,
             list_sum(list_transform(range(1, 17),
               i -> (sv.se[r.s*16+i] - cbs.ce[r.s*16+i])
                  * (sv.se[r.s*16+i] - cbs.ce[r.s*16+i]))) AS dist
      FROM sv CROSS JOIN (SELECT unnest(range(0, 4)) AS s) r CROSS JOIN cbs
    ),
    enc AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rk
        FROM d
      ) WHERE rk = 1
    )
"""

_PQ_ORACLE_PRELUDE = (
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
"""
    + _PQ_SQL_CTES
)

_PQ_PROBE_DIST_SQL = """
      SELECT p.vec_id AS probe_id, r.s, cbs.code,
             list_sum(list_transform(range(1, 17),
               i -> (p.se[r.s*16+i] - cbs.ce[r.s*16+i])
                  * (p.se[r.s*16+i] - cbs.ce[r.s*16+i]))) AS pdist
      FROM sv p CROSS JOIN (SELECT unnest(range(0, 4)) AS s) r CROSS JOIN cbs
      WHERE p.vec_id < 5
"""


@q(
    "pq_encode",
    _PQ_ORACLE_PRELUDE
    + """
    SELECT vec_id AS id,
           string_agg(code::VARCHAR, ',' ORDER BY s) AS pq_code
    FROM enc GROUP BY vec_id
    """,
    "data",
)
def q_pq_encode(spark, sf_dir):
    """Product-quantization encode (m=4 subspaces x ksub=16 codewords
    over the 64-dim embeddings): the Faiss-style compression that stores
    m bytes per vector before ADC search — the 100 TB ANN storage shape.
    Codebooks are the 16 smallest-id vectors split into contiguous
    subvectors (deterministic seed; pq_train's integer-exact Lloyd's is
    the production path, pytest-pinned). Assignment is argmin of
    scaled-integer squared L2 — exact 64-bit arithmetic, bit-identical
    in the SQL oracle. Map-only: one broadcast codebook literal + a
    per-row fold, no shuffle at any corpus size. Codes emit as a
    comma-joined string so every gate column is driver-sortable."""
    from sonnerie_spark.operators.similarity import pq_codebook_data, pq_encode

    emb = load_par(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    enc = pq_encode(emb, codebooks=pq_codebook_data(emb, m=4, ksub=16))
    return enc.select(
        "id",
        F.array_join(F.col("codes").cast("array<string>"), ",").alias("pq_code"),
    )


@q(
    "pq_ann_topk",
    _PQ_ORACLE_PRELUDE
    + f"""
    , pd AS ({_PQ_PROBE_DIST_SQL}),
    ad AS (
      SELECT pd.probe_id, enc.vec_id AS id, cast(sum(pd.pdist) AS BIGINT) AS adist
      FROM enc JOIN pd ON pd.s = enc.s AND pd.code = enc.code
      WHERE enc.vec_id <> pd.probe_id
      GROUP BY pd.probe_id, enc.vec_id
    )
    SELECT probe_id, id, adist, rk FROM (
      SELECT probe_id, id, adist,
             cast(row_number() OVER (PARTITION BY probe_id ORDER BY adist, id)
                  AS INTEGER) AS rk
      FROM ad
    ) WHERE rk <= 5
    """,
    "data",
)
def q_pq_ann_topk(spark, sf_dir):
    """ADC (asymmetric-distance) top-5 per probe over the PQ-encoded
    corpus: each probe precomputes its (m x ksub) integer distance table
    once, then every corpus vector costs m table LOOKUPS instead of a
    64-dim dot product — the classic PQ scan that makes billion-vector
    search memory-bandwidth-bound. Distance tables ride a broadcast of
    a tiny probe-batch job; the corpus side is one map-only pass over
    the codes + a per-probe rank window. Ranking is exact 64-bit
    integer arithmetic with an (adist, id) tie-break — no float
    flakiness in either engine."""
    from sonnerie_spark.operators.similarity import pq_adc_topk, pq_codebook_data

    emb = load_par(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    books = pq_codebook_data(emb, m=4, ksub=16)
    probes = emb.filter(F.col("vec_id") < 5)
    return pq_adc_topk(emb, probes, codebooks=books, k=5)


@q(
    "ivf_pq_topk",
    _IVF_ASSIGN_SQL
    + ",\n    assign AS (SELECT vec_id, cid FROM r WHERE rn = 1),\n"
    + _PQ_SQL_CTES
    + f"""
    , pc AS (
      SELECT vec_id AS probe_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid ASC) AS crank
      FROM scored WHERE vec_id < 5
    ),
    probe_cents AS (SELECT probe_id, cid FROM pc WHERE crank <= 2),
    pd AS ({_PQ_PROBE_DIST_SQL}),
    adsum AS (
      SELECT pd.probe_id, e2.vec_id AS id, cast(sum(pd.pdist) AS BIGINT) AS adist
      FROM enc e2
      JOIN assign a ON a.vec_id = e2.vec_id
      JOIN probe_cents p ON p.cid = a.cid
      JOIN pd ON pd.probe_id = p.probe_id AND pd.s = e2.s AND pd.code = e2.code
      WHERE e2.vec_id <> p.probe_id
      GROUP BY pd.probe_id, e2.vec_id
    )
    SELECT probe_id, id, adist, rk FROM (
      SELECT probe_id, id, adist,
             cast(row_number() OVER (PARTITION BY probe_id ORDER BY adist, id)
                  AS INTEGER) AS rk
      FROM adsum
    ) WHERE rk <= 5
    """,
    "data",
)
def q_ivf_pq_topk(spark, sf_dir):
    """IVF+PQ top-5 (nprobe=2 of 8 lists, m=4 x ksub=16 codes) — the
    full Faiss-style billion-vector recipe: the coarse quantizer prunes
    the corpus to ~nprobe/C, the PQ codes make each surviving candidate
    cost m integer table lookups instead of a 64-dim dot product, and
    the corpus is never touched at full precision at query time. Both
    stages are the independently-gated building blocks (ivf_assign +
    pq_encode/ADC) composed; ranking is exact 64-bit integer arithmetic
    with an (adist, id) tie-break, so the value hash pins the whole
    pipeline cross-engine."""
    from sonnerie_spark.operators.similarity import ivf_pq_topk, pq_codebook_data

    emb = load_par(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    books = pq_codebook_data(emb, m=4, ksub=16)
    probes = emb.filter(F.col("vec_id") < 5)
    return ivf_pq_topk(
        emb, probes, num_centroids=8, nprobe=2, codebooks=books, k=5
    )


@q(
    "ivfpq_index_incremental",
    _PQ_ORACLE_PRELUDE
    + f"""
    , pd AS ({_PQ_PROBE_DIST_SQL}),
    ad AS (
      SELECT pd.probe_id, enc.vec_id AS id, cast(sum(pd.pdist) AS BIGINT) AS adist
      FROM enc JOIN pd ON pd.s = enc.s AND pd.code = enc.code
      WHERE enc.vec_id <> pd.probe_id
      GROUP BY pd.probe_id, enc.vec_id
    )
    SELECT probe_id, id, adist, rk FROM (
      SELECT probe_id, id, adist,
             cast(row_number() OVER (PARTITION BY probe_id ORDER BY adist, id)
                  AS INTEGER) AS rk
      FROM ad
    ) WHERE rk <= 5
    """,
    "data",
    gate_only=True,
)
def q_ivfpq_index_incremental(spark, sf_dir):
    """Persistent IVF+PQ index lifecycle (IvfPqIndex): build() trains
    centroids + codebooks on the FIRST batch (vec_id < 250) and indexes
    it, add() encodes+assigns the rest against the STORED parameters
    (one map-only pass, no retraining), topk() reads the partition-
    pruned code lists and ranks by ADC. With nprobe == num_centroids
    the result must equal the FLAT ADC scan over everything ever added
    — and because the first batch contains the 16 smallest ids, its
    seed codebooks equal the whole-corpus seed, so the oracle is the
    same flat-ADC SQL as pq_ann_topk (centroid placement provably
    cancels out of a full probe). Lossy-search fidelity is measured
    separately (tools/ann_recall.py); THIS gate pins the index
    machinery: param persistence, incremental encode, list layout."""

    from sonnerie_spark.operators.similarity import IvfPqIndex

    emb = load_par(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    idx = IvfPqIndex(spark, _gate_tmp("ivfpq_gate_"))
    idx.build(emb.filter(F.col("vec_id") < 250), num_centroids=8, pq_iters=0)
    idx.add(emb.filter(F.col("vec_id") >= 250))
    probes = emb.filter(F.col("vec_id") < 5)
    return idx.topk(probes, nprobe=8, k=5)


@q(
    "semdedup_keep",
    _IVF_ASSIGN_SQL
    + f""",
    assign AS (SELECT vec_id, cid, cos AS ccos FROM r WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id AS id
      FROM assign a
      JOIN assign b ON a.cid = b.cid
       AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
      JOIN v va ON va.vec_id = a.vec_id
      JOIN v vb ON vb.vec_id = b.vec_id
      WHERE round({_cos_sql("va.e", "vb.e")}, 6) >= 0.2
    )
    SELECT a.vec_id AS id, cast(a.cid as int) AS centroid_id,
           a.ccos AS centroid_cosine
    FROM assign a LEFT JOIN dropped d ON d.id = a.vec_id
    WHERE d.id IS NULL
    """,
    "data",
)
def q_semdedup_keep(spark, sf_dir):
    """SemDeDup semantic deduplication (public arXiv 2303.09540):
    cluster with the coarse quantizer, drop within-cluster cosine
    near-duplicates keeping the item farthest from its centroid —
    the embedding-space curation pass LLM pipelines run between exact
    dedup and mixing. The pair probe is an equi-join on centroid_id
    (never all-pairs; cluster count bounds the quadratic work, same
    contract as the LSH band buckets); the one-shot higher-priority-
    witness drop rule makes the result exactly SQL-expressible."""
    from sonnerie_spark.operators.similarity import semdedup

    emb = load_par(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # no boundary= here: the standalone gate's input is one raw scan,
    # and the A/B read 2.97 s -> 3.85 s with the spill (write + result
    # checkpoint cost more than re-folding a cheap scan three times).
    # The composites DO pass one — their input lineage is the whole
    # survivors pipeline.
    return semdedup(emb, num_centroids=8, tau=0.2)


@q(
    "time_travel_roundtrip",
    """
    WITH base AS (
      SELECT event_type || '-' || lpad(cast(user_id as varchar), 4, '0') AS key,
             event_id * 1000 AS ts,
             round(value * 100) AS v
      FROM events
    )
    SELECT key, count(*) AS n, sum(v) AS total
    FROM base GROUP BY key
    """,
    "parity",
    gate_only=True,
)
def q_time_travel_roundtrip(spark, sf_dir):
    """Time travel under the gate: commit the base data, then commit an
    overwrite of EVERY record (+1e6) — and read back as_of the FIRST
    transaction. The snapshot must aggregate to the ORIGINAL values,
    proving as_of excludes later runs from both the scan and the LWW
    merge (the head read would be off by n*1e6 per key)."""

    from sonnerie_spark.db import Database

    base = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        (F.col("event_id") * 1000).cast("long").alias("ts"),
        F.round(F.col("value") * 100).alias("v"),
    )

    def as_records(df):
        return df.select(
            "key",
            "ts",
            F.lit("F").alias("fmt"),
            F.lit(None).cast("array<long>").alias("v_long"),
            F.array(F.col("v")).alias("v_double"),
            F.lit(None).cast("array<string>").alias("v_str"),
            F.lit(None).cast("array<binary>").alias("v_bin"),
        )

    db = Database(spark, _gate_tmp("tt_gate_"))
    t1 = db.commit_dataframe(as_records(base), check_duplicates=False)
    db.commit_dataframe(
        as_records(base.withColumn("v", F.col("v") + F.lit(1_000_000.0))),
        check_duplicates=False,
    )
    snap = db.read(as_of=t1)
    return snap.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.element_at("v_double", 1)).alias("total"),
    )


@q(
    "rollup_multicol_roundtrip",
    """
    WITH base AS (
      SELECT event_type || '-' || lpad(cast(user_id as varchar), 4, '0') AS key,
             event_id * 1000 AS ts,
             round(value * 100) AS v1,
             cast(user_id as double) AS v2
      FROM events
    )
    SELECT key, ts - ts % 10000000 AS bucket_ts,
           count(*) AS n1, sum(v1) AS sum1, min(v1) AS min1, max(v1) AS max1,
           count(*) AS n2, sum(v2) AS sum2, min(v2) AS min2, max(v2) AS max2
    FROM base GROUP BY key, bucket_ts
    """,
    "streaming",
    gate_only=True,
)
def q_rollup_multicol_roundtrip(spark, sf_dir):
    """Multi-column continuous rollup under the gate: records carry TWO
    float values ("FF"); a fine rollup (1e6 ns, num_values=2) is built
    incrementally, a coarse rollup (1e7 ns) cascades FROM it, and the
    oracle aggregates both columns straight off the raw events — so the
    per-column reaggregation identity (n/sum/min/max each cascade
    independently) is proved end-to-end, closing the r4 'first numeric
    column only' limitation."""

    from sonnerie_spark.db import Database
    from sonnerie_spark.streaming.rollup import ContinuousRollup

    base = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "-", F.col("event_type"), F.lpad(F.col("user_id").cast("string"), 4, "0")
        ).alias("key"),
        (F.col("event_id") * 1000).cast("long").alias("ts"),
        F.round(F.col("value") * 100).alias("v1"),
        F.col("user_id").cast("double").alias("v2"),
    )
    records = base.select(
        "key",
        "ts",
        F.lit("FF").alias("fmt"),
        F.lit(None).cast("array<long>").alias("v_long"),
        F.array(F.col("v1"), F.col("v2")).alias("v_double"),
        F.lit(None).cast("array<string>").alias("v_str"),
        F.lit(None).cast("array<binary>").alias("v_bin"),
    )
    src = Database(spark, _gate_tmp("mcroll_src_"))
    fine = ContinuousRollup(
        src,
        _gate_tmp("mcroll_fine_"),
        interval_ns=1_000_000,
        num_values=2,
    )
    coarse = ContinuousRollup.cascade(
        fine, _gate_tmp("mcroll_coarse_"), interval_ns=10_000_000
    )
    src.commit_dataframe(records, check_duplicates=False)
    fine.refresh()
    coarse.refresh()
    return coarse.read().select(
        "key", "bucket_ts",
        "n1", "sum1", "min1", "max1",
        "n2", "sum2", "min2", "max2",
    )


@q(
    "dedup_ngram_containment",
    f"""
    WITH sh AS ({{SH}}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS overlap
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(overlap / least(sa.n, sb.n) * 1000000 + 0.5) / 1000000
             AS containment
    FROM co JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
    WHERE floor(overlap / least(sa.n, sb.n) * 1000000 + 0.5) / 1000000 >= 0.35
    """.replace("{SH}", shingles_sql(3)),
    "data",
)
def q_dedup_ngram_containment(spark, sf_dir):
    """Asymmetric near-dup pairs by shingle containment
    (overlap/min(|A|,|B|)): catches a document embedded inside a larger
    one, which symmetric Jaccard's union term dilutes below threshold —
    the companion pass CCNet-style pipelines run next to Jaccard. Same
    posting-list plan and skew cap as the Jaccard gate."""
    docs = load_par(spark, sf_dir, "documents")
    return dedup.ngram_containment_pairs(
        docs, "doc_id", "text", k=3, threshold=0.35
    )


@q(
    "multimodal_resize_real",
    """
    WITH b AS (
      SELECT doc_id, doc_id % 7 + 1 AS w,
             octet_length(encode(text)) // (3 * (doc_id % 7 + 1)) AS h
      FROM documents
    )
    SELECT doc_id AS media_id,
           CASE WHEN h >= 1 THEN 'ppm' END AS codec,
           CASE WHEN h >= 1 THEN cast((w + 1) // 2 AS int) END AS width,
           CASE WHEN h >= 1 THEN cast((h + 1) // 2 AS int) END AS height,
           CASE WHEN h >= 1 THEN cast(
             9 + length(cast((w + 1) // 2 AS varchar))
               + length(cast((h + 1) // 2 AS varchar))
               + 3 * ((w + 1) // 2) * ((h + 1) // 2) AS bigint) END AS n_bytes
    FROM b
    """,
    "data",
)
def q_multimodal_resize_real(spark, sf_dir):
    """REAL image transform under the gate: every document becomes a
    genuine P6 PPM (as in multimodal_decode_real), resize_media
    subsamples every 2nd pixel with numpy and re-emits valid netpbm
    bytes; the gate checks the recovered geometry AND the exact output
    byte count (header digits + ceil(w/2)*ceil(h/2)*3 pixels) against
    the construction arithmetic. Zero-height constructions pass through
    as NULLs (the codec seam)."""
    from sonnerie_spark.operators import multimodal

    docs = load_par(spark, sf_dir, "documents")
    n = F.octet_length(F.col("text"))
    w = (F.col("doc_id") % 7 + 1).cast("int")
    h = F.floor(n / (w * 3)).cast("int")
    header = F.concat_ws(
        "", F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(
            F.encode(header, "UTF-8"), F.encode(F.col("text"), "UTF-8")
        ).alias("content"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    return multimodal.resize_media(media, factor=2).select(
        "media_id", "codec", "width", "height", "n_bytes"
    )


@q(
    "multimodal_resample_real",
    """
    SELECT doc_id AS media_id,
           'wav' AS codec,
           1 AS channels,
           4000 AS sample_rate,
           cast((octet_length(encode(text)) // 2 + 1) // 2 AS bigint) AS n_frames,
           cast(((octet_length(encode(text)) // 2 + 1) // 2) * 1000000 // 4000
             AS bigint) AS duration_us
    FROM documents
    """,
    "data",
)
def q_multimodal_resample_real(spark, sf_dir):
    """REAL audio transform under the gate: each document's bytes become
    a genuine 16-bit mono 8 kHz WAV (RIFF header built per row), and
    resample_media decimates every 2nd frame — the gate checks the
    recovered channel/rate/frame-count/duration against the
    construction arithmetic (frames = ceil((bytes//2)/2), rate 4 kHz).
    Same construction-proves-the-parser pattern as the PPM gates."""
    import struct

    from sonnerie_spark.operators import multimodal

    docs = load_par(spark, sf_dir, "documents")

    def build(batches):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        for pdf in batches:
            def to_wav(text: str) -> bytes:
                raw = text.encode()
                data = raw[: len(raw) // 2 * 2]  # whole 16-bit frames
                return (
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack("<I", 16)
                    + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                    + b"data" + struct.pack("<I", len(data)) + data
                )

            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "audio",
                    "content": pdf["text"].map(to_wav),
                    "meta": None,
                }
            )

    media = docs.select("doc_id", "text").mapInPandas(build, MEDIA_SCHEMA_DDL)
    return multimodal.resample_media(media, factor=2).select(
        "media_id", "codec", "channels", "sample_rate", "n_frames",
        "duration_us",
    )


MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, content binary, meta map<string,string>"
)


@q(
    "split_leakage",
    f"""
    WITH pairs AS ({_minhash_oracle_sql()}),
    sp AS ({sampling.hash_split_sql("doc_id")} FROM documents)
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
    FROM pairs p
    JOIN sp sa ON sa.id = p.id_a
    JOIN sp sb ON sb.id = p.id_b
    WHERE sa.split <> sb.split
    """,
    "data",
)
def q_split_leakage(spark, sf_dir):
    """Train/test leakage audit: near-duplicate pairs whose members land
    in DIFFERENT hash-split partitions — the contamination a random
    (non-content-hashed) split silently ships. Composes the gated LSH
    pair stream with the gated deterministic split. The split is a pure
    function of the id (hash_split_expr — the same expressions
    hash_split projects), so it is attached to the pair stream MAP-ONLY:
    the former broadcast joins against two copies of the split table
    re-scanned the corpus twice and, at scale, built a corpus-row-count
    broadcast per side (guide §2.4 — a join that carries no information
    the probe row doesn't already hold). Inner-join semantics are
    preserved by construction: every pair id comes from the corpus, so
    the joins never dropped a row. The audit now costs exactly the pair
    enumeration at any corpus size."""
    docs = load_par(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text")
    _, split_a = sampling.hash_split_expr("id_a")
    _, split_b = sampling.hash_split_expr("id_b")
    return (
        pairs.withColumn("split_a", split_a)
        .withColumn("split_b", split_b)
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            F.col("id_a").cast("long"), F.col("id_b").cast("long"),
            "split_a", "split_b",
        )
    )


@q(
    "chunk_documents",
    """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 1, 0) + 1, 12)) AS st
      FROM t
    )
    SELECT doc_id AS id,
           st // 12 AS chunk_idx,
           array_to_string(toks[st + 1 : st + 16], ' ') AS chunk_text,
           least(len(toks) - st, 16) AS n_tokens
    FROM s
    """,
    "data",
)
def q_chunk_documents(spark, sf_dir):
    """Fixed-window document chunking with overlap (16-token chunks,
    stride 12) — the pre-training/RAG chunking pass. Map-only array
    expressions; the oracle rebuilds every window with list slicing, so
    boundary behavior (short tail window, stride overlap, full token
    coverage) is value-hash-checked."""
    docs = load_par(spark, sf_dir, "documents")
    return textops.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=16, stride=12
    ).select("id", F.col("chunk_idx"), "chunk_text", F.col("n_tokens").cast("long"))


@q(
    "cap_per_group",
    f"""
    WITH c AS (SELECT lang, count(*) AS n_g FROM documents GROUP BY lang)
    SELECT id, grp FROM (
      SELECT d.doc_id AS id, d.lang AS grp, c.n_g,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY {phash_sql("cast(doc_id as varchar)")}, d.doc_id
             ) AS rk
      FROM documents d JOIN c ON d.lang = c.lang
    ) WHERE n_g <= 100 OR rk <= 100
    """,
    "data",
)
def q_cap_per_group(spark, sf_dir):
    """Per-group document cap (the per-domain cap of web curation): at
    most 100 docs per language, selected by stable hash order. Groups
    within budget bypass the rank window entirely (sampling.py scale
    note); at sf0.01 the cap bites 'en'/'zh'/'es'-sized groups while
    smaller languages take the sort-free branch, so both paths are
    under the oracle."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.cap_per_group(docs, "lang", "doc_id", max_per_group=100)


@q(
    "deterministic_shuffle",
    f"""
    SELECT doc_id AS id,
           row_number() OVER (
             ORDER BY {phash_sql("'shuffle#' || cast(doc_id as varchar)")}, doc_id
           ) AS pos
    FROM documents
    """,
    "data",
)
def q_deterministic_shuffle(spark, sf_dir):
    """Reproducible global corpus shuffle: pos = rank of a seeded
    content hash. The implementation is the distributed two-phase rank
    (range-partitioned sort + per-partition offsets collected from ONE
    persisted materialization) — never a single-task global window —
    and the oracle is the literal global row_number, so the gate proves
    the distributed rank equals the sequential one at any partition
    count."""
    docs = load_par(spark, sf_dir, "documents")
    return sampling.deterministic_shuffle(docs, "doc_id")


def _png_pixels_sql(w_sql: str, h_sql: str) -> str:
    """The gate's pixel-source arithmetic, shared by both engines: pixel
    bytes are the ASCII prefix of repeat(md5(text), 9) sized w*h*3 —
    ASCII so DuckDB's VARCHAR md5/substring digest the same BYTES the
    Spark-side decoder sees (DuckDB cannot slice BLOBs)."""
    return f"substring(repeat(md5(text), 9), 1, ({w_sql}) * ({h_sql}) * 3)"


def _png_media(spark, sf_dir, w_mod: int, w_add: int, h_mod: int, h_add: int):
    """documents -> MEDIA-shaped frame of REAL zlib-compressed PNGs.

    Per row: w = doc_id % w_mod + w_add, h = doc_id % h_mod + h_add,
    RGB pixels = ASCII bytes of repeat(md5(text), 9)[: w*h*3], scanline
    filter = doc_id % 5 so all five PNG filter types are exercised
    under the oracle. Runs as mapInPandas; pngcodec ships by value.
    """
    from sonnerie_spark.operators import pngcodec

    enc = pngcodec.encode_png
    docs = load_par(spark, sf_dir, "documents")

    def build(batches):
        import hashlib

        import numpy as np
        import pandas as pd  # noqa: PLC0415 - worker-side import

        for pdf in batches:
            def to_png(doc_id: int, text: str) -> bytes:
                w = doc_id % w_mod + w_add
                h = doc_id % h_mod + h_add
                need = w * h * 3
                src = (hashlib.md5(text.encode()).hexdigest() * 9)[:need]
                px = np.frombuffer(src.encode("ascii"), np.uint8).reshape(
                    h, w, 3
                )
                return enc(px, filter_type=doc_id % 5)

            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "content": [
                        to_png(int(i), t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "meta": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(build, MEDIA_SCHEMA_DDL)


@q(
    "multimodal_decode_png",
    f"""
    SELECT doc_id AS media_id, 'png' AS codec,
           cast(doc_id % 12 + 1 AS int) AS width,
           cast(doc_id % 8 + 1 AS int) AS height,
           3 AS channels, true AS valid,
           md5({_png_pixels_sql("doc_id % 12 + 1", "doc_id % 8 + 1")})
             AS pixel_md5
    FROM documents
    """,
    "data",
)
def q_multimodal_decode_png(spark, sf_dir):
    """COMPRESSED image decode under the gate: each document becomes a
    genuine zlib-compressed PNG (all five scanline filters across the
    corpus), and decode_media recovers geometry AND the md5 of the
    defiltered pixel matrix FROM THE COMPRESSED BYTES. The oracle
    recomputes both from the construction arithmetic, so a decoder that
    skims headers without really inflating/defiltering hash-mismatches
    on pixel_md5. This retires the 'compressed formats are stubbed'
    seam for PNG; lossy codecs (JPEG/MP3) remain behind
    decode_features. No reference analogue (njaard/sonnerie has no
    media ops); training-data-pipeline extension surface."""
    from sonnerie_spark.operators import multimodal

    media = _png_media(spark, sf_dir, 12, 1, 8, 1)
    return multimodal.decode_media(media).select(
        "media_id", "codec", "width", "height", "channels", "valid",
        "pixel_md5",
    )


@q(
    "multimodal_resize_png",
    """
    SELECT doc_id AS media_id, 'png' AS codec,
           cast((doc_id % 11 + 3) // 2 AS int) AS width,
           cast((doc_id % 7 + 3) // 2 AS int) AS height,
           3 AS channels, true AS valid
    FROM documents
    """,
    "data",
)
def q_multimodal_resize_png(spark, sf_dir):
    """Compressed-format resize roundtrip: build real PNGs (w in 2..12,
    h in 2..8), nearest-neighbor downsample by 2 through resize_media
    (decode -> stride -> re-encode), then RE-DECODE the emitted bytes
    with decode_media in the same plan — the gate certifies the
    re-encoded PNG is standards-decodable with ceil(w/2) x ceil(h/2)
    geometry. Pixel-exactness of the stride subsample is pinned by
    tests/test_multimodal_png.py against numpy slicing."""
    from sonnerie_spark.operators import multimodal

    media = _png_media(spark, sf_dir, 11, 2, 7, 2)
    resized = multimodal.resize_media(media, factor=2).select(
        "media_id",
        F.lit("image").alias("kind"),
        "content",
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    return multimodal.decode_media(resized).select(
        "media_id", "codec", "width", "height", "channels", "valid"
    )


@q(
    "multimodal_decode_gif",
    r"""
    SELECT doc_id AS media_id, 'gif' AS codec,
           cast(doc_id % 10 + 1 AS int) AS width,
           cast(doc_id % 6 + 1 AS int) AS height,
           3 AS channels, true AS valid,
           md5(regexp_replace(
                 substring(repeat(md5(text), 2), 1,
                           (doc_id % 10 + 1) * (doc_id % 6 + 1)),
                 '(.)', '\1\1\1', 'g')) AS pixel_md5
    FROM documents
    """,
    "data",
)
def q_multimodal_decode_gif(spark, sf_dir):
    """GIF (LZW) decode under the gate: each document becomes a genuine
    GIF89a (palette indices = ASCII bytes of repeat(md5(text), 2),
    identity grayscale palette i -> (i,i,i), alternating interlaced /
    sequential row order), and decode_media recovers geometry AND the
    md5 of the palette-expanded RGB matrix from the LZW stream. The
    oracle triples every source character (the identity palette makes
    RGB = each index byte three times), so a decoder that skims the
    screen descriptor without really running LZW hash-mismatches.
    Together with multimodal_decode_png this leaves only lossy codecs
    (JPEG/MP3/video) behind the decode_features seam. No reference
    analogue; training-data-pipeline extension surface."""
    from sonnerie_spark.operators import gifcodec, multimodal

    enc = gifcodec.encode_gif
    docs = load_par(spark, sf_dir, "documents")

    def build(batches):
        import hashlib

        import numpy as np
        import pandas as pd  # noqa: PLC0415 - worker-side import

        pal = np.stack([np.arange(128)] * 3, axis=1).astype(np.uint8)

        def to_gif(doc_id: int, text: str) -> bytes:
            w = doc_id % 10 + 1
            h = doc_id % 6 + 1
            src = (hashlib.md5(text.encode()).hexdigest() * 2)[: w * h]
            idx = np.frombuffer(src.encode("ascii"), np.uint8).reshape(h, w)
            return enc(idx, pal, interlace=bool(doc_id % 2))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "content": [
                        to_gif(int(i), t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "meta": None,
                }
            )

    media = docs.select("doc_id", "text").mapInPandas(build, MEDIA_SCHEMA_DDL)
    return multimodal.decode_media(media).select(
        "media_id", "codec", "width", "height", "channels", "valid",
        "pixel_md5",
    )


@q(
    "multimodal_decode_jpeg",
    """
    WITH m AS (
      SELECT doc_id, md5(text) AS hx,
             doc_id % 4 + 1 AS wb, doc_id % 3 + 1 AS hb
      FROM documents
    ),
    cells AS (
      SELECT doc_id, hx, wb, hb, unnest(range(hb * wb)) AS cell FROM m
    ),
    segs AS (
      SELECT doc_id, wb, hb, cell // wb AS by, cell % wb AS bx,
             repeat(chr(ascii(substring(hx, cell + 1, 1))
                        - ascii(substring(hx, cell + 1, 1)) % 2), 8) AS seg
      FROM cells
    ),
    rws AS (
      SELECT doc_id, by, any_value(wb) AS wb, any_value(hb) AS hb,
             string_agg(seg, '' ORDER BY bx) AS rowstr
      FROM segs GROUP BY doc_id, by
    )
    SELECT doc_id AS media_id, 'jpeg' AS codec,
           cast(any_value(wb) * 8 AS int) AS width,
           cast(any_value(hb) * 8 AS int) AS height,
           1 AS channels, true AS valid,
           md5(string_agg(repeat(rowstr, 8), '' ORDER BY by)) AS pixel_md5
    FROM rws GROUP BY doc_id
    """,
    "data",
)
def q_multimodal_decode_jpeg(spark, sf_dir):
    """Baseline JPEG decode under an EXACT gate despite the codec being
    lossy: each document becomes a genuine DCT/Huffman-coded grayscale
    JPEG whose image is uniform 8x8 blocks with even sample values
    (block b = md5(text)[b] rounded down to even) — for such images
    every AC coefficient is zero and the DC (8c) quantizes by 16 to
    round(c/2), exact for even c, so encode->decode is LOSSLESS and
    decode_media's pixel_md5 is value-hash-checkable. The oracle
    reassembles the block matrix in SQL and digests the same bytes; a
    decoder that skims SOF0 without really running Huffman + IDCT
    mismatches. With PNG and GIF gated the same way, every still-image
    format common in crawled corpora now decodes for real; the
    remaining seam is audio/video codecs. No reference analogue;
    training-data-pipeline extension surface."""
    from sonnerie_spark.operators import jpegcodec, multimodal

    enc = jpegcodec.encode_jpeg
    docs = load_par(spark, sf_dir, "documents")

    def build(batches):
        import hashlib

        import numpy as np
        import pandas as pd  # noqa: PLC0415 - worker-side import

        def to_jpeg(doc_id: int, text: str) -> bytes:
            wb = doc_id % 4 + 1
            hb = doc_id % 3 + 1
            hx = hashlib.md5(text.encode()).hexdigest()[: wb * hb]
            vals = np.array(
                [ord(c) - ord(c) % 2 for c in hx], np.uint8
            ).reshape(hb, wb)
            img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
            return enc(img, quality=50)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "content": [
                        to_jpeg(int(i), t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "meta": None,
                }
            )

    media = docs.select("doc_id", "text").mapInPandas(build, MEDIA_SCHEMA_DDL)
    return multimodal.decode_media(media).select(
        "media_id", "codec", "width", "height", "channels", "valid",
        "pixel_md5",
    )


@q(
    "multimodal_decode_mp3",
    """
    SELECT doc_id AS media_id, 'mp3' AS codec,
           cast(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS int)
             AS channels,
           cast([44100, 48000, 32000][doc_id % 3 + 1] AS int)
             AS sample_rate,
           cast(doc_id % 20 + 5 AS bigint) AS n_frames,
           (doc_id % 20 + 5) * 1152 * 1000000
             // [44100, 48000, 32000][doc_id % 3 + 1] AS duration_us,
           true AS valid
    FROM documents
    """,
    "data",
)
def q_multimodal_decode_mp3(spark, sf_dir):
    """MP3 bitstream metadata under an exact gate: each document becomes
    a syntactically valid MPEG-1 Layer III CBR stream (real headers from
    the published bitrate/sample-rate tables, doc-dependent frame count
    / bitrate / rate / channel mode, ID3v2 tag prefixed on every 4th
    doc), and decode_media walks it frame by frame — a parser that
    reads one header and guesses from the byte length gets the
    per-bitrate frame sizes and the tag skip wrong and desyncs, so
    n_frames/duration only match if the walk is real. PCM synthesis
    stays honestly behind the decode_features seam (codec libraries are
    absent here). No reference analogue; training-data-pipeline
    extension surface."""
    from sonnerie_spark.operators import multimodal

    docs = load_par(spark, sf_dir, "documents")

    def build(batches):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        from sonnerie_spark.operators import mp3codec

        def to_mp3(doc_id: int, text: str) -> bytes:
            s = mp3codec.encode_mp3_frames(
                doc_id % 20 + 5,
                bitrate_kbps=[64, 128, 320][doc_id % 3],
                sample_rate=[44100, 48000, 32000][doc_id % 3],
                mono=doc_id % 2 == 0,
                fill=text.encode()[:16] or b"\x55",
            )
            if doc_id % 4 == 0:
                s = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 12]) + b"x" * 12 + s
            return s

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "audio",
                    "content": [
                        to_mp3(int(i), t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "meta": None,
                }
            )

    media = docs.select("doc_id", "text").mapInPandas(build, MEDIA_SCHEMA_DDL)
    return multimodal.decode_media(media).select(
        "media_id", "codec", "channels", "sample_rate", "n_frames",
        "duration_us", "valid",
    )


@q(
    "normalize_text",
    r"""
    WITH dirty AS (
      SELECT doc_id,
             'Cafe' || chr(769) || ' ' || chr(7) || text || '  fin'
               AS raw
      FROM documents
    )
    SELECT doc_id AS id,
           nfc_normalize(
             trim(regexp_replace(
               regexp_replace(raw, '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
               '[ \t]+', ' ', 'g'))) AS text,
           nfc_normalize(
             trim(regexp_replace(
               regexp_replace(raw, '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
               '[ \t]+', ' ', 'g'))) <> raw AS changed
    FROM dirty
    """,
    "data",
)
def q_normalize_text(spark, sf_dir):
    """Unicode text normalization (NFC + control strip + whitespace
    collapse), the canonical cleaning pass before dedup — un-normalized
    text silently splits duplicate groups because 'Café' composed and
    decomposed hash differently. The gate injects a decomposed accent
    (e + U+0301), a BEL control byte, and doubled spaces into every
    document in BOTH engines and value-hashes the full normalized
    string, so the NFC recomposition and the regex semantics must agree
    exactly with DuckDB's nfc_normalize. Strip/collapse/trim are
    Catalyst regexp_replace (scan speed); NFC is the one Arrow-batched
    pandas UDF, computed once via a two-step projection. No reference
    analogue; training-data-pipeline extension surface."""
    from sonnerie_spark.operators.text import normalize_text

    docs = load_par(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("Cafe\u0301 \x07"), F.col("text"), F.lit("  fin")
        ).alias("text"),
    )
    return normalize_text(docs, "doc_id", "text")


@q(
    "strip_boilerplate",
    """
    WITH dirty AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0
                   THEN 'ACCEPT COOKIES' || chr(10) ELSE '' END)
             || text ||
             (CASE WHEN doc_id % 2 = 0
                   THEN chr(10) || '(c) 2020 Example Corp' ELSE '' END) AS t
      FROM documents
    ),
    params AS (
      SELECT greatest(2, cast(floor(0.01 * count(*)) AS int)) AS thr
      FROM dirty
    ),
    lines AS (
      SELECT doc_id,
             unnest(range(len(string_split(t, chr(10))))) AS pos,
             unnest(string_split(t, chr(10))) AS line
      FROM dirty
    ),
    hot AS (
      SELECT trim(line) AS k FROM lines, params
      WHERE trim(line) <> ''
      GROUP BY trim(line), thr HAVING count(DISTINCT doc_id) >= thr
    ),
    kept AS (
      SELECT doc_id, pos, line FROM lines
      WHERE trim(line) NOT IN (SELECT k FROM hot)
    ),
    tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
    agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id AS id, coalesce(a.text, '') AS text,
           t.n_lines - coalesce(a.n_kept, 0) AS n_removed
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
    "data",
)
def q_strip_boilerplate(spark, sf_dir):
    """Corpus-frequency boilerplate removal (CCNet-style paragraph
    dedup): lines repeated across >= max(2, 1% of docs) distinct
    documents are stripped and each document reassembled in order. The
    gate injects a cookie banner into every 3rd doc and a license
    footer into every 2nd in BOTH engines — those lines' document
    frequency puts them over the threshold, the real text lines stay
    under it — and value-hashes the full cleaned text. Plan: one
    explode + two-phase distinct-doc count, then a BROADCAST anti-join
    of the line stream against the (tiny by construction) hot set —
    the corpus shuffles once, at line granularity, and never joins
    against itself. No reference analogue; training-data-pipeline
    extension surface."""
    from sonnerie_spark.operators.text import strip_boilerplate

    docs = load_par(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("ACCEPT COOKIES\n"))
            .otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("\n(c) 2020 Example Corp"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return strip_boilerplate(docs, "doc_id", "text", min_doc_frac=0.01)


@q(
    "dedup_exact_incremental",
    # gate_only like the other stateful-lifecycle roundtrips
    # (write_path, lsh_index_incremental): each execution creates and
    # mutates a fresh on-disk index, so repeat-timing it benches tempdir
    # churn, not a query; batch-ingest cost is measured by the scale
    # tools instead.
    """
    WITH dup AS (
      SELECT d.doc_id, md5(a.text) AS h, d.doc_id % 2 AS b
      FROM documents d
      JOIN documents a ON a.doc_id = d.doc_id - d.doc_id % 3
    ),
    fb AS (SELECT h, min(b) AS mb FROM dup GROUP BY h),
    keep AS (
      SELECT dup.h AS h, min(dup.doc_id) AS id
      FROM dup JOIN fb ON dup.h = fb.h AND dup.b = fb.mb
      GROUP BY dup.h
    )
    SELECT id, h FROM keep
    """,
    "data",
    gate_only=True,
)
def q_dedup_exact_incremental(spark, sf_dir):
    """Incremental exact dedup via the persistent ExactIndex — the
    exact-match sibling of the LSH index lifecycle gate: a duplicate-
    rich corpus (every 3 docs share one text) arrives as two batches
    (even ids, then odd ids); each batch dedups against everything
    already ingested WITHOUT rescanning it (md5-hash index partitioned
    by 2-hex-char prefix; the probe reads only the batch's own prefix
    partitions — partition pruning from the directory layout). The
    union of the two adds must equal a global first-occurrence dedup
    ordered by (batch, id), which the oracle computes set-wise in SQL.
    No reference analogue; training-data-pipeline extension surface."""

    from sonnerie_spark.operators.dedup import ExactIndex

    docs = load_par(spark, sf_dir, "documents")
    anchors = docs.select(
        F.col("doc_id").alias("aid"), F.col("text").alias("atext")
    )
    dup = (
        docs.select(
            "doc_id",
            (F.col("doc_id") - F.col("doc_id") % 3).alias("aid"),
        )
        .join(anchors, "aid")
        .select("doc_id", F.col("atext").alias("text"))
    )
    idx = ExactIndex(spark, _gate_tmp("exidx_gate_"))
    k1 = idx.add(dup.filter(F.col("doc_id") % 2 == 0), "doc_id", "text")
    k2 = idx.add(dup.filter(F.col("doc_id") % 2 == 1), "doc_id", "text")
    return k1.union(k2)


@q(
    "ivf_index_incremental",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < 5),
    scored AS (
      SELECT probe_id, vec_id AS cand_id,
             round({_cos_sql("pe", "e")}, 6) AS cosine
      FROM probes JOIN v ON vec_id != probe_id
    ),
    ranked AS (
      SELECT probe_id, cand_id, cosine,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, cand_id) AS rank
      FROM scored
    )
    SELECT probe_id, cand_id, cosine, cast(rank as int) AS rank
    FROM ranked WHERE rank <= 5
    """,
    "data",
    gate_only=True,
)
def q_ivf_index_incremental(spark, sf_dir):
    """Persistent incremental ANN index lifecycle (IvfIndex, the
    embedding-space sibling of the LSH/exact index gates): centroids
    train once on the even-id half of the corpus (integer-exact Lloyd's
    round), the odd-id half arrives later and is assigned against the
    STORED centroids — a map-only broadcast fold, no retraining — and
    the query reads only probed inverted lists (the storage is
    partitioned by centroid_id; unprobed lists prune at the directory
    level, plan-asserted in tests). With nprobe == num_centroids the
    search is EXACT, so the oracle is brute-force cosine top-k over the
    whole corpus — any drift in the build/add/append/prune plumbing
    (lost rows, wrong list, stale centroids) breaks the identity. No
    reference analogue; training-data-pipeline extension surface."""

    from sonnerie_spark.operators.similarity import IvfIndex

    emb = load_par(spark, sf_dir, "embeddings")
    idx = IvfIndex(spark, _gate_tmp("ivfidx_gate_"))
    idx.build(emb.filter(F.col("vec_id") % 2 == 0), num_centroids=4)
    idx.add(emb.filter(F.col("vec_id") % 2 == 1))
    return idx.topk(emb.filter(F.col("vec_id") < 5), nprobe=4, k=5)


def _build_avi_batches(batches):
    """mapInPandas builder shared by the AVI gates: each document becomes
    a genuine RIFF AVI container holding ``doc_id % 3 + 2`` MJPEG frames
    at 25 fps; frame f's image is the same uniform even-valued 8x8-block
    construction the JPEG gate proves lossless, with the block->hex-char
    mapping rotated by f (block b reads md5(text)[(b+f) % 32]) so every
    frame of every video has distinct, SQL-reproducible pixels."""
    import hashlib

    import numpy as np
    import pandas as pd  # noqa: PLC0415 - worker-side import

    from sonnerie_spark.operators import avicodec, jpegcodec

    def to_avi(doc_id: int, text: str) -> bytes:
        wb = doc_id % 4 + 1
        hb = doc_id % 3 + 1
        nf = doc_id % 3 + 2
        hx = hashlib.md5(text.encode()).hexdigest()
        frames = []
        for f in range(nf):
            vals = np.array(
                [
                    ord(hx[(b + f) % 32]) - ord(hx[(b + f) % 32]) % 2
                    for b in range(wb * hb)
                ],
                np.uint8,
            ).reshape(hb, wb)
            img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
            frames.append(jpegcodec.encode_jpeg(img, quality=50))
        return avicodec.encode_avi_mjpeg(
            frames, width=wb * 8, height=hb * 8, fps=25
        )

    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": "video",
                "content": [
                    to_avi(int(i), t)
                    for i, t in zip(pdf["doc_id"], pdf["text"])
                ],
                "meta": None,
            }
        )


_AVI_PIXEL_CTE = """
    WITH m AS (
      SELECT doc_id, md5(text) AS hx,
             doc_id % 4 + 1 AS wb, doc_id % 3 + 1 AS hb,
             doc_id % 3 + 2 AS nf
      FROM documents
    )
"""


@q(
    "multimodal_decode_avi",
    _AVI_PIXEL_CTE
    + """,
    cells AS (
      SELECT doc_id, hx, wb, hb, nf, unnest(range(hb * wb)) AS cell FROM m
    ),
    segs AS (
      SELECT doc_id, wb, hb, nf, cell // wb AS by, cell % wb AS bx,
             repeat(chr(ascii(substring(hx, (cell % 32) + 1, 1))
                        - ascii(substring(hx, (cell % 32) + 1, 1)) % 2), 8)
               AS seg
      FROM cells
    ),
    rws AS (
      SELECT doc_id, by, any_value(wb) AS wb, any_value(hb) AS hb,
             any_value(nf) AS nf,
             string_agg(seg, '' ORDER BY bx) AS rowstr
      FROM segs GROUP BY doc_id, by
    )
    SELECT doc_id AS media_id, 'mjpeg' AS codec,
           cast(any_value(wb) * 8 AS int) AS width,
           cast(any_value(hb) * 8 AS int) AS height,
           1 AS channels,
           cast(any_value(nf) AS bigint) AS n_frames,
           cast(any_value(nf) * 40000 AS bigint) AS duration_us,
           true AS valid,
           md5(string_agg(repeat(rowstr, 8), '' ORDER BY by)) AS pixel_md5
    FROM rws GROUP BY doc_id
    """,
    "data",
)
def q_multimodal_decode_avi(spark, sf_dir):
    """Video-container decode under an EXACT gate: each document becomes
    a real RIFF AVI (avih/strh/strf headers + movi MJPEG frame chunks,
    built by ``avicodec``), and decode_media walks the container for
    geometry/frame-count/duration then REALLY decodes frame 0 through
    the baseline JPEG codec — pixel_md5 digests the decoded pixels, so
    a parser that skims avih without running Huffman+IDCT on the frame
    bytes mismatches. The frame images reuse the even-valued-block
    construction the JPEG gate proves lossless; the oracle reassembles
    frame 0's pixel matrix in SQL and digests the same bytes. With this
    the multimodal surface covers image + audio + video containers for
    real; the residual seam is inter-frame codecs (H.264 etc.). No
    reference analogue; training-data-pipeline extension surface."""
    from sonnerie_spark.operators import multimodal

    docs = load_par(spark, sf_dir, "documents")
    media = docs.select("doc_id", "text").mapInPandas(
        _build_avi_batches, MEDIA_SCHEMA_DDL
    )
    return multimodal.decode_media(media).select(
        "media_id", "codec", "width", "height", "channels", "n_frames",
        "duration_us", "valid", "pixel_md5",
    )


@q(
    "multimodal_frame_sample",
    _AVI_PIXEL_CTE
    + """,
    fr AS (
      SELECT doc_id, hx, wb, hb, unnest(range(nf)) AS f FROM m
    ),
    kept AS (SELECT * FROM fr WHERE f % 2 = 0),
    cells AS (
      SELECT doc_id, f, hx, wb, hb, unnest(range(hb * wb)) AS cell
      FROM kept
    ),
    segs AS (
      SELECT doc_id, f, wb, cell // wb AS by, cell % wb AS bx,
             repeat(chr(ascii(substring(hx, ((cell + f) % 32) + 1, 1))
                        - ascii(substring(hx, ((cell + f) % 32) + 1, 1)) % 2),
                    8) AS seg
      FROM cells
    ),
    rws AS (
      SELECT doc_id, f, by, any_value(wb) AS wb,
             string_agg(seg, '' ORDER BY bx) AS rowstr
      FROM segs GROUP BY doc_id, f, by
    )
    SELECT doc_id AS media_id, cast(f AS int) AS frame_idx,
           cast(any_value(wb) * 8 AS int) AS width,
           cast(count(*) * 8 AS int) AS height,
           1 AS channels, true AS valid,
           md5(string_agg(repeat(rowstr, 8), '' ORDER BY by)) AS pixel_md5
    FROM rws GROUP BY doc_id, f
    """,
    "data",
)
def q_multimodal_frame_sample(spark, sf_dir):
    """REAL video frame sampling (the task's 'frame-sample' op, no
    longer plumbing-only): keep every 2nd frame of each AVI and decode
    the kept frames — one row per kept frame, pixel_md5 over the
    DECODED pixels. The container walk is a chunk-header skip, so
    decode cost tracks the SAMPLED frame count, not video length
    (the 100 TB story: sampling 1-in-30 frames costs 1/30th of the
    Huffman+IDCT, the dominant term). Rows fan out (video -> frames);
    the oracle regenerates every kept frame's pixel matrix in SQL.
    Composition: avicodec (container) x jpegcodec (frames) — no new
    codec was needed for video."""
    from sonnerie_spark.operators import multimodal

    docs = load_par(spark, sf_dir, "documents")
    media = docs.select("doc_id", "text").mapInPandas(
        _build_avi_batches, MEDIA_SCHEMA_DDL
    )
    return multimodal.sample_frames(media, every=2)


# ---------------------------------------------------------------------------
# Language-model scoring + importance resampling (operators/lm.py)
# ---------------------------------------------------------------------------

_LM_VOCAB = 24  # < the corpus's 31 token types, so the <unk> path is live
_DSIR_B = 64


def _lm_prefix() -> str:
    """Shared CTE prefix for the LM oracles: tokenized docs, the
    English reference slice, vocab/uni/bi training tables, and the
    per-doc mapped bigram stream (dbigm)."""
    return f"""    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t, lang
      FROM documents
    ),
    reft AS (SELECT t FROM toks WHERE lang = 'en'),
    runi AS (SELECT unnest(t) AS tok FROM reft),
    vocab AS (
      SELECT tok FROM (
        SELECT tok,
               row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
        FROM runi GROUP BY tok
      ) WHERE rk <= {_LM_VOCAB}
    ),
    veff AS (SELECT count(*) + 1 AS v FROM vocab),
    runim AS (
      SELECT CASE WHEN tok IN (SELECT tok FROM vocab)
                  THEN tok ELSE '<unk>' END AS w
      FROM runi
    ),
    uni AS (SELECT w, count(*) AS c1 FROM runim GROUP BY w),
    rbig AS (
      SELECT t[pos+1] AS t1, t[pos+2] AS t2
      FROM (SELECT unnest(range(len(t)-1)) AS pos, t
            FROM reft WHERE len(t) >= 2)
    ),
    rbigm AS (
      SELECT CASE WHEN t1 IN (SELECT tok FROM vocab)
                  THEN t1 ELSE '<unk>' END AS w1,
             CASE WHEN t2 IN (SELECT tok FROM vocab)
                  THEN t2 ELSE '<unk>' END AS w2
      FROM rbig
    ),
    bi AS (SELECT w1, w2, count(*) AS c2 FROM rbigm GROUP BY w1, w2),
    dbig AS (
      SELECT doc_id AS id, t[pos+1] AS t1, t[pos+2] AS t2
      FROM (SELECT doc_id, unnest(range(len(t)-1)) AS pos, t
            FROM toks WHERE len(t) >= 2)
    ),
    dbigm AS (
      SELECT id,
             CASE WHEN t1 IN (SELECT tok FROM vocab)
                  THEN t1 ELSE '<unk>' END AS w1,
             CASE WHEN t2 IN (SELECT tok FROM vocab)
                  THEN t2 ELSE '<unk>' END AS w2
      FROM dbig
    )"""


def _lm_oracle() -> str:
    """Add-½ bigram LM trained on the English slice, scoring every doc.

    Mirrors operators/lm.py exactly: case-folded whitespace tokens,
    top-24 vocab by (count desc, token asc), OOV -> '<unk>', per-gram
    integer score (2·c2+1)·1e9 // (2·c1+v_eff) summed per doc. All
    arithmetic integral -> bitwise cross-engine equality at any SF.
    """
    return f"""{_lm_prefix()},
    sc AS (
      SELECT id,
             (2*coalesce(c2, 0) + 1) * 1000000000
               // (2*coalesce(c1, 0) + (SELECT v FROM veff)) AS score_q
      FROM dbigm
      LEFT JOIN uni ON uni.w = dbigm.w1
      LEFT JOIN bi ON bi.w1 = dbigm.w1 AND bi.w2 = dbigm.w2
    )
    SELECT id, count(*) AS n_bigrams,
           cast(sum(score_q) AS BIGINT) AS score_sum,
           cast(sum(score_q) // count(*) AS BIGINT) AS score_mean_q
    FROM sc GROUP BY id
    """


def _lm_kn_oracle() -> str:
    """Interpolated Kneser-Ney bigram scoring (D = 3/4): the same
    train/score shape as _lm_oracle with the KN integer score — every
    factor an integer, HUGEINT-widened products, exact floor division
    (mirrors lm.lm_kn_doc_score bit-for-bit)."""
    return f"""{_lm_prefix()},
    pre AS (SELECT w1, count(*) AS n1f, sum(c2) AS ptot FROM bi GROUP BY w1),
    n1b AS (SELECT w2, count(*) AS n1b FROM bi GROUP BY w2),
    ndd AS (SELECT count(*) AS ndd FROM bi),
    sc AS (
      SELECT id,
        CAST(CASE WHEN coalesce(ptot, 0) > 0 THEN
          CAST(1000000000 AS HUGEINT) * (
            CAST(greatest(4*coalesce(c2, 0) - 3, 0) AS HUGEINT) * d.ndd
            + CAST(3 AS HUGEINT) * coalesce(n1f, 0) * coalesce(n1b, 0)
          ) // (CAST(4 AS HUGEINT) * ptot * d.ndd)
        ELSE CAST(1000000000 AS HUGEINT) * coalesce(n1b, 0) // d.ndd
        END AS BIGINT) AS score_q
      FROM dbigm
      LEFT JOIN bi ON bi.w1 = dbigm.w1 AND bi.w2 = dbigm.w2
      LEFT JOIN pre ON pre.w1 = dbigm.w1
      LEFT JOIN n1b ON n1b.w2 = dbigm.w2
      , ndd d
    )
    SELECT id, count(*) AS n_bigrams,
           cast(sum(score_q) AS BIGINT) AS score_sum,
           cast(sum(score_q) // count(*) AS BIGINT) AS score_mean_q
    FROM sc GROUP BY id
    """


@q("lm_score_bigram", _lm_oracle(), "data")
def q_lm_score_bigram(spark, sf_dir):
    """CCNet-style LM fluency scoring: train add-½ bigram statistics on
    the trusted slice (lang='en'), score EVERY document by its mean
    smoothed bigram probability (integer 1e-9 units). The float
    log-perplexity twin (lm.lm_perplexity) is the interactive variant;
    this integer path is the oracle gate. Plan: map-only array-native
    bigram formation, broadcast vocab/unigram joins, one equi-join on
    the bigram key, one hash agg on id — no window shuffle, no UDF."""
    from sonnerie_spark.operators import lm

    docs = load_par(spark, sf_dir, "documents")
    ref = docs.filter(F.col("lang") == "en")
    vocab, uni, bi, v_eff = lm.lm_bigram_counts(
        ref, "text", vocab_size=_LM_VOCAB
    )
    return lm.lm_doc_score(
        docs, "doc_id", "text", vocab=vocab, uni=uni, bi=bi, v_eff=v_eff
    )


def _lm_bucket_oracle() -> str:
    """Head/middle/tail CCNet split over the LM scores: rank per lang
    by (score desc, id), integer third cuts. Wraps the full LM oracle
    as a nested-WITH subquery."""
    return f"""
    WITH scored AS ({_lm_oracle()}),
    j AS (
      SELECT s.id, d.lang, s.score_mean_q
      FROM scored s JOIN documents d ON d.doc_id = s.id
    ),
    r AS (
      SELECT id, lang, score_mean_q,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score_mean_q DESC, id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM j
    )
    SELECT id, lang, score_mean_q,
           CASE WHEN rk*3 <= n THEN 'head'
                WHEN rk*3 <= n*2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r
    """


@q("lm_score_kneser_ney", _lm_kn_oracle(), "data")
def q_lm_score_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM scoring (Kneser & Ney 1995 —
    the smoothing KenLM, and therefore CCNet's LMs, actually use; the
    add-½ gate is the simpler published variant): same
    train-on-trusted-slice / score-everything shape, with the KN
    continuation probability N1+(·,w2)/N1+(·,·) interpolated under a
    3/4 absolute discount. Every per-gram score is an exact integer
    (HUGEINT/DECIMAL(38,0)-widened products, floor division), so the
    gate is bitwise at any SF. Plan: the add-½ plan plus two broadcast
    vocabulary-bounded continuation dims — no new shuffle class."""
    from sonnerie_spark.operators import lm

    docs = load_par(spark, sf_dir, "documents")
    ref = docs.filter(F.col("lang") == "en")
    vocab, uni, bi, _ = lm.lm_bigram_counts(ref, "text", vocab_size=_LM_VOCAB)
    return lm.lm_kn_doc_score(
        docs, "doc_id", "text", vocab=vocab, uni=uni, bi=bi
    )


@q("lm_bucket_split", _lm_bucket_oracle(), "data")
def q_lm_bucket_split(spark, sf_dir):
    """CCNet's final stage: bucket every document into head/middle/tail
    thirds per language by its LM fluency score — the standard
    perplexity-stratified corpus layout downstream samplers draw from.
    Integer keep-rules only (3·rk vs n), so the gate is exact; the rank
    window is over the per-document score table, not token rows."""
    from sonnerie_spark.operators import lm

    docs = load_par(spark, sf_dir, "documents")
    ref = docs.filter(F.col("lang") == "en")
    vocab, uni, bi, v_eff = lm.lm_bigram_counts(
        ref, "text", vocab_size=_LM_VOCAB
    )
    scored = lm.lm_doc_score(
        docs, "doc_id", "text", vocab=vocab, uni=uni, bi=bi, v_eff=v_eff
    ).join(docs.select(F.col("doc_id").alias("id"), "lang"), "id")
    return lm.lm_bucket_split(scored)


def _dsir_oracle() -> str:
    """DSIR hashed-feature importance weights, top-200 selection.

    target = lang='en' slice, raw = whole corpus, 64 hash buckets;
    per-token smoothed target/raw ratio in exact integer 1e-6 units,
    mean per doc; deterministic top-k by (w_mean_q desc, id).
    """
    b = _DSIR_B
    return f"""
    WITH tokex AS (
      SELECT doc_id, lang, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang, {phash_sql("tok")} % {b} AS b FROM tokex
    ),
    ct AS (SELECT b, count(*) AS ct FROM feat WHERE lang = 'en' GROUP BY b),
    cr AS (SELECT b, count(*) AS cr FROM feat GROUP BY b),
    tt AS (SELECT count(*) AS n_t FROM feat WHERE lang = 'en'),
    tr AS (SELECT count(*) AS n_r FROM feat),
    sc AS (
      SELECT doc_id AS id,
             (coalesce(ct, 0) + 1) * ((SELECT n_r FROM tr) + {b}) * 1000000
               // ((coalesce(cr, 0) + 1) * ((SELECT n_t FROM tt) + {b})) AS w_q
      FROM feat LEFT JOIN ct USING (b) LEFT JOIN cr USING (b)
    ),
    agg AS (
      SELECT id, count(*) AS n_tokens,
             cast(sum(w_q) AS BIGINT) AS w_sum,
             cast(sum(w_q) // count(*) AS BIGINT) AS w_mean_q
      FROM sc GROUP BY id
    )
    SELECT id, n_tokens, w_sum, w_mean_q
    FROM agg ORDER BY w_mean_q DESC, id LIMIT 200
    """


@q("dsir_select", _dsir_oracle(), "data")
def q_dsir_select(spark, sf_dir):
    """DSIR data selection: hash tokens into 64 feature buckets, weight
    each document by its mean smoothed target/raw likelihood ratio
    (target = the English slice), keep the top 200 by (weight desc,
    id). Both distribution tables are 64 rows — broadcast no matter the
    corpus size; totals ride 1-row broadcast cross-joins; top-k is
    TakeOrderedAndProject. The whole scoring pass is map-only plus one
    hash agg on id."""
    from sonnerie_spark.operators import lm

    docs = load_par(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = lm.dsir_doc_weights(
        docs, "doc_id", "text", target=target, num_buckets=_DSIR_B
    )
    return lm.dsir_topk(w, 200)


# ---------------------------------------------------------------------------
# Mergeable distinct sketches (operators/sketch.py)
# ---------------------------------------------------------------------------


def _hll_oracle() -> str:
    from sonnerie_spark.operators.sketch import hll_sketch_sql

    return hll_sketch_sql(
        "cast(user_id AS varchar)", "events", bucket_bits=8
    )


@q("distinct_sketch_hll", _hll_oracle(), "analytics")
def q_distinct_sketch_hll(spark, sf_dir):
    """HyperLogLog sketch of distinct event users: 256 integer buckets
    from the portable md5 hash, rank via a pure-comparison ladder (no
    float log2) — deterministic, so the DuckDB oracle reproduces the
    sketch bit-for-bit. At 100 TB this replaces the full
    COUNT(DISTINCT) shuffle with one map-side-combined aggregate whose
    shuffle payload is <= 256 rows per task, and sketches merge across
    runs/days by per-bucket max (metamorphic test pins merge ==
    whole-corpus sketch)."""
    from sonnerie_spark.operators import sketch

    ev = load_par(spark, sf_dir, "events")
    return sketch.hll_sketch(
        ev, F.col("user_id").cast("string"), bucket_bits=8
    )


def _hll_grouped_oracle() -> str:
    ph = phash_sql("cast(user_id AS varchar)")
    from sonnerie_spark.operators.sketch import hll_rho_sql

    return f"""
    SELECT grp, bucket, max(rho) AS max_rho FROM (
      SELECT event_type AS grp,
             cast(h % 256 AS INTEGER) AS bucket,
             {hll_rho_sql("(h // 256)", 52)} AS rho
      FROM (SELECT event_type, {ph} AS h FROM events)
    ) GROUP BY grp, bucket
    """


@q("distinct_sketch_by_group", _hll_grouped_oracle(), "analytics")
def q_distinct_sketch_by_group(spark, sf_dir):
    """Per-group HLL: distinct users per event type in one grouped
    sketch pass — the table HllStore maintains incrementally under
    streaming ingest (per-bucket max merge is idempotent, so
    at-least-once replays leave the store unchanged; pinned in
    tests/test_sketch.py). Deterministic integers, oracle-checked
    bitwise."""
    from sonnerie_spark.operators import sketch

    ev = load_par(spark, sf_dir, "events")
    return sketch.hll_sketch_grouped(
        ev, "event_type", F.col("user_id").cast("string"), bucket_bits=8
    )


def _cms_oracle() -> str:
    from sonnerie_spark.operators.sketch import cms_sketch_sql

    body = cms_sketch_sql("v", "tok", depth=4, width=1024)
    h = phash_sql("cast(row AS varchar) || '#' || v")
    salts = ", ".join(f"({i})" for i in range(4))
    return f"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS v FROM documents
    ),
    sk AS ({body}),
    cand AS (SELECT DISTINCT v FROM tok),
    probe AS (
      SELECT v, row, cast({h} % 1024 AS INTEGER) AS col
      FROM cand CROSS JOIN (VALUES {salts}) AS s(row)
    ),
    est AS (
      SELECT v, min(coalesce(c, 0)) AS est
      FROM probe LEFT JOIN sk USING (row, col) GROUP BY v
    )
    SELECT v, est FROM est ORDER BY est DESC, v LIMIT 20
    """


@q("heavy_hitters_cms", _cms_oracle(), "data")
def q_heavy_hitters_cms(spark, sf_dir):
    """Heavy hitters via Count-Min: build the d=4 x w=1024 integer
    sketch over all document tokens (one map-side-combined agg, ≤ 4096
    counters per task on the wire), broadcast it, and rank the
    candidate tokens by their min-over-rows estimate. Deterministic
    salted portable hashes -> the oracle reproduces sketch AND
    estimates exactly. At 100 TB the sketch build touches each token
    once and the query side never shuffles the corpus."""
    from sonnerie_spark.operators import sketch

    docs = load_par(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("v")
    )
    sk = sketch.cms_sketch(tok, "v", depth=4, width=1024)
    cand = tok.distinct()
    return sketch.cms_topk(cand, sk, k=20, depth=4, width=1024)


def _kmv_oracle() -> str:
    ph = phash_sql("v")
    return f"""
    WITH ta AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS v
      FROM documents WHERE lang = 'en'
    ),
    tb AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS v
      FROM documents WHERE lang = 'de'
    ),
    ka AS (SELECT DISTINCT {ph} AS h FROM ta ORDER BY h LIMIT 256),
    kb AS (SELECT DISTINCT {ph} AS h FROM tb ORDER BY h LIMIT 256),
    un AS (
      SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
      ORDER BY h LIMIT 256
    )
    SELECT (SELECT count(*) FROM un) AS k_eff,
           (SELECT count(*) FROM un
            WHERE h IN (SELECT h FROM ka)
              AND h IN (SELECT h FROM kb)) AS inter,
           (SELECT count(*) FROM un
            WHERE h IN (SELECT h FROM ka)
              AND h IN (SELECT h FROM kb)) * 1000000
             // (SELECT count(*) FROM un) AS jaccard_q
    """


@q("kmv_source_overlap", _kmv_oracle(), "data")
def q_kmv_source_overlap(spark, sf_dir):
    """Corpus-overlap estimation without materializing either token
    set: KMV bottom-k sketches of the English vs German token domains,
    Jaccard from the bottom-k of their union — the integer estimator
    (inter·1e6 div k_eff) is a deterministic function of the sketches,
    so even the ESTIMATE is oracle-checked bitwise. The pattern scales
    to source-vs-source contamination matrices: each sketch is ≤ k
    rows, pairwise overlap costs k-row joins, never corpus joins."""
    from sonnerie_spark.operators import sketch

    docs = load_par(spark, sf_dir, "documents")
    tok = lambda lang: docs.filter(F.col("lang") == lang).select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("v")
    )
    ka = sketch.kmv_sketch(tok("en"), "v", k=256)
    kb = sketch.kmv_sketch(tok("de"), "v", k=256)
    return sketch.kmv_overlap(ka, kb, k=256).select(
        "k_eff", "inter", "jaccard_q"
    )


def _dd_oracle() -> str:
    from sonnerie_spark.operators.sketch import dd_sketch_sql

    return dd_sketch_sql("value", "events", relative_accuracy=0.01)


def _dd_bykey_oracle() -> str:
    from sonnerie_spark.operators.sketch import (
        dd_group_quantile_sql,
        dd_sketch_grouped_sql,
    )

    return dd_group_quantile_sql(
        dd_sketch_grouped_sql(
            "key", "value", f"({SERIES_SQL})", relative_accuracy=0.01
        ),
        0.99,
    )


@q("quantile_by_key_dd", _dd_bykey_oracle(), "analytics")
def q_quantile_by_key_dd(spark, sf_dir):
    """Per-key p99 via grouped DDSketch over the sonnerie series view —
    the canonical quantile-sketch deployment ("p99 latency per
    service"), tied to the parity surface: sketch per key (one hash
    agg, ≤ few-k integer rows/key), then the quantile bucket extracted
    DISTRIBUTED by a per-group cumulative-sum window (groups never
    exchange data). The hashed gate value is the integer (sgn, bucket)
    pair per key; the float reconstruction (gamma^bucket, a
    transcendental) stays out of the hash by design — dd_group_quantile
    returns it as a non-gated `est` column."""
    from sonnerie_spark.operators import sketch

    s = series(spark, sf_dir)
    sk = sketch.dd_sketch_grouped(s, "key", "value", relative_accuracy=0.01)
    return sketch.dd_group_quantile(sk, 0.99, relative_accuracy=0.01).select(
        "grp", "sgn", "bucket"
    )


@q("quantile_sketch_dd", _dd_oracle(), "analytics")
def q_quantile_sketch_dd(spark, sf_dir):
    """DDSketch quantile sketch (Masson et al., VLDB 2019) over the
    events value column — the 4th classic sketch (HLL cardinality, CMS
    frequency, KMV overlap, DD quantiles): p50/p99 at 100 TB without
    shuffling distinct values. The log-bucket index uses ln_cr
    (correctly-rounded ops only), so the INTEGER sketch itself — not
    just a plausibility bound — is oracle-checked bitwise; the float
    quantile walk (dd_quantiles) happens driver-side on the bounded
    bucket table, pinned by pytest against numpy within the paper's
    relative-error guarantee. One map-only index expression + one hash
    agg with map-side partials; mergeable by per-bucket sum."""
    from sonnerie_spark.operators import sketch

    ev = load_par(spark, sf_dir, "events")
    return sketch.dd_sketch(ev, "value", relative_accuracy=0.01)


def _dd_merge_oracle() -> str:
    from sonnerie_spark.operators.sketch import dd_sketch_grouped_sql

    return dd_sketch_grouped_sql(
        "key", "value", f"({SERIES_SQL})", relative_accuracy=0.01
    )


@q("dd_merge_grouped", _dd_merge_oracle(), "analytics")
def q_dd_merge_grouped(spark, sf_dir):
    """The grouped-sketch MERGE identity under the gate (r8, closing
    the r7 advice class): two per-key DDSketches built from disjoint
    halves of the series view (even/odd event_id) merged with dd_merge
    must equal the one-shot grouped sketch — the mergeability property
    that makes the sketch reusable across partitions, runs, and time
    windows, now keyed on (grp, sgn, bucket) so groups never collapse.
    The oracle is the one-shot grouped-sketch SQL; any drift in the
    merge keying (the silent group-collapse bug dd_merge now rejects)
    or in either half's bucket index breaks the bitwise hash. Plan:
    each half is one map-only index projection + one hash agg, the
    merge is one more hash agg over their union — every exchange
    carries ≤ a fixed bucket table per (group, task), never raw
    values."""
    from sonnerie_spark.operators import sketch

    s = series(spark, sf_dir)
    a = sketch.dd_sketch_grouped(
        s.filter(F.col("event_id") % 2 == 0), "key", "value",
        relative_accuracy=0.01,
    )
    b = sketch.dd_sketch_grouped(
        s.filter(F.col("event_id") % 2 == 1), "key", "value",
        relative_accuracy=0.01,
    )
    return sketch.dd_merge(a, b)


def _hll_merge_oracle() -> str:
    from sonnerie_spark.operators.sketch import hll_sketch_sql

    return hll_sketch_sql(
        "cast(user_id AS varchar)", "events", bucket_bits=8
    )


@q("hll_merge_halves", _hll_merge_oracle(), "analytics")
def q_hll_merge_halves(spark, sf_dir):
    """HLL MERGE identity under the gate (r8, completing the
    merge-identity family with dd_merge_grouped / cms_merge_halves):
    sketches of the even- and odd-event_id halves merged by per-bucket
    max must equal the one-shot sketch bit-for-bit — previously pinned
    only by pytest. This is the property that lets 100 TB of daily
    sketches roll up without rescanning history. Plan: two map-only
    hash projections + per-half aggs + one <=256-row merge agg."""
    from sonnerie_spark.operators import sketch

    ev = load_par(spark, sf_dir, "events")
    val = F.col("user_id").cast("string")
    a = sketch.hll_sketch(ev.filter(F.col("event_id") % 2 == 0), val)
    b = sketch.hll_sketch(ev.filter(F.col("event_id") % 2 == 1), val)
    return sketch.hll_merge(a, b)


def _bloom_oracle() -> str:
    from sonnerie_spark.operators.sketch import (
        bloom_probe_sql,
        bloom_sketch_sql,
    )

    sk = bloom_sketch_sql(
        "text",
        "(SELECT text FROM documents WHERE doc_id % 17 = 0)",
        num_bits=2048,
        num_hashes=4,
    )
    probe = bloom_probe_sql(
        "id",
        "(SELECT doc_id AS id, text AS v FROM documents)",
        num_bits=2048,
        num_hashes=4,
    )
    return f"""
    WITH sk AS ({sk}),
    probe AS ({probe})
    SELECT id,
           bool_and(sk.bits IS NOT NULL AND (sk.bits & probe.mask) <> 0)
             AS might_contain,
           (id % 17 = 0) AS is_member
    FROM probe LEFT JOIN sk USING (word_idx)
    GROUP BY id
    """


@q("bloom_filter_membership", _bloom_oracle(), "data")
def q_bloom_filter_membership(spark, sf_dir):
    """Bloom-filter membership (r8): build a 2048-bit, 4-hash filter
    over every 17th document's text and probe the WHOLE corpus — the
    broadcastable membership sketch corpus curation uses for
    decontamination / blocklist checks when the member set is too big
    to inline (a 2^30-bit filter is 128 MiB: one broadcast for any
    corpus). The hashed values pin id, the verdict AND ground-truth
    membership, so the gate proves no false negatives ever and that
    every false positive — the filter fills to ~44% at sf0.1, yielding
    real FPs — is the SAME deterministic false positive in both
    engines (bit positions are salted portable hashes, the word table
    ORs map-side). Plan: member scan -> <=32-word bit_or agg; probe is
    a map-only explode + one BROADCAST word-table join + per-id agg;
    no corpus shuffle beyond the per-id AND."""
    from sonnerie_spark.operators import sketch

    docs = load_par(spark, sf_dir, "documents")
    members = docs.filter(F.col("doc_id") % 17 == 0)
    sk = sketch.bloom_sketch(
        members, F.col("text"), num_bits=2048, num_hashes=4
    )
    out = sketch.bloom_might_contain(
        docs.select(F.col("doc_id").alias("id"), "text"), sk,
        value=F.col("text"), num_bits=2048, num_hashes=4,
    )
    return out.select(
        "id", "might_contain", (F.col("id") % 17 == 0).alias("is_member")
    )


def _cms_merge_oracle() -> str:
    from sonnerie_spark.operators.sketch import cms_sketch_sql

    return cms_sketch_sql(
        "cast(user_id AS varchar)", "events", depth=4, width=1024
    )


@q("cms_merge_halves", _cms_merge_oracle(), "analytics")
def q_cms_merge_halves(spark, sf_dir):
    """Count-Min MERGE identity under the gate: per-(row, col) SUM of
    the two halves' counter tables must equal the one-shot sketch
    EXACTLY (counters are additive — unlike the epsilon-bounded
    estimates, the merge identity is integer-exact). Every exchange
    carries <= depth*width integer rows per task."""
    from sonnerie_spark.operators import sketch

    ev = load_par(spark, sf_dir, "events")
    val = F.col("user_id").cast("string")
    a = sketch.cms_sketch(ev.filter(F.col("event_id") % 2 == 0), val)
    b = sketch.cms_sketch(ev.filter(F.col("event_id") % 2 == 1), val)
    return sketch.cms_merge(a, b)


def _kmv_merge_oracle() -> str:
    from sonnerie_spark.operators.sketch import kmv_sketch_sql

    return kmv_sketch_sql("cast(user_id AS varchar)", "events", k=64)


@q("kmv_merge_halves", _kmv_merge_oracle(), "analytics")
def q_kmv_merge_halves(spark, sf_dir):
    """KMV (bottom-k) MERGE identity under the gate: the 64 smallest
    distinct hashes of the union of two half-sketches must equal the
    one-shot bottom-64 — KMV is closed under merge (the union's
    bottom-k is a function of the halves' bottom-k's alone), which is
    what makes per-source overlap estimation (kmv_source_overlap)
    composable across runs without rescanning. k=64 < the sf0.01+ user
    domain, so the truncation path is genuinely exercised. ≤ 2k rows
    ever reach the merge."""
    from sonnerie_spark.operators import sketch

    ev = load_par(spark, sf_dir, "events")
    val = F.col("user_id").cast("string")
    a = sketch.kmv_sketch(ev.filter(F.col("event_id") % 2 == 0), val, k=64)
    b = sketch.kmv_sketch(ev.filter(F.col("event_id") % 2 == 1), val, k=64)
    return sketch.kmv_merge(a, b, k=64)


#: Shared pixel-construction CTEs for every image dHash gate: each
#: document becomes a 20x14 P6 PPM whose pixels are the ASCII bytes of
#: repeat(md5(BASE text), 27)[:840], where BASE is the even doc of the
#: (2k, 2k+1) couple — so couples share pixels — and odd docs perturb
#: exactly the first pixel byte (+1), making each couple a constructed
#: near-duplicate. One definition feeds both the 63-bit and the
#: 126-bit oracles, so the construction cannot drift between gates.
_DHASH_PX_CTES = """raw AS (
      SELECT d.doc_id AS media_id, d.doc_id % 2 AS odd,
             substring(repeat(md5(b.text), 27), 1, 840) AS px0
      FROM documents d
      JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 2
    ),
    m AS (
      SELECT media_id,
             CASE WHEN odd = 1
                  THEN chr(ascii(substring(px0, 1, 1)) + 1)
                       || substring(px0, 2)
                  ELSE px0 END AS px
      FROM raw
    ),
    """


def _dhash_gray_sql(row: int, col: int) -> str:
    """Integer grayscale of raw pixel (row, col) of the 20-wide PPM:
    (r+g+b) // 3 over 1-based ascii bytes — the exact mirror of
    multimodal's (r+g+b) div 3."""

    def a(j):  # 1-based ascii of pixel byte j
        return f"ascii(substring(px, {j}, 1))"

    j0 = (row * 20 + col) * 3 + 1
    return f"(({a(j0)} + {a(j0 + 1)} + {a(j0 + 2)}) // 3)"


def _dhash_word_sql(comparisons) -> str:
    """CASE-sum of one 63-bit dHash word from (bit, left_px, right_px)
    pixel-coordinate comparisons — summed with non-aggregate + (stays
    BIGINT; an aggregate SUM would widen to HUGEINT — the bm25
    class)."""
    terms = [
        f"(CASE WHEN {_dhash_gray_sql(*left)} > {_dhash_gray_sql(*right)} "
        f"THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b, left, right in comparisons
    ]
    return "(" + "\n           + ".join(terms) + ")"


def _dhash_h_cmp():
    """Horizontal word: grid sample (x*20 div 10, y*14 div 7) =
    (2x, 2y); bit y*9+x iff grid[y][x] > grid[y][x+1]."""
    return [
        (y * 9 + x, (2 * y, 2 * x), (2 * y, 2 * x + 2))
        for y in range(7)
        for x in range(9)
    ]


def _dhash_v_cmp():
    """Vertical word: grid sample (x*20 div 9, y*14 div 8); bit y*9+x
    iff grid[y][x] > grid[y+1][x] — dhash128_media's second word."""
    yv = [(14 * y) // 8 for y in range(8)]
    xv = [(20 * x) // 9 for x in range(9)]
    return [
        (y * 9 + x, (yv[y], xv[x]), (yv[y + 1], xv[x]))
        for y in range(7)
        for x in range(9)
    ]


def _dhash_ctes() -> str:
    """CTE network for the 63-bit image dHash gates: the shared pixel
    construction plus the generated integer mirror of
    multimodal.dhash_media's arithmetic (grayscale div, grid floor
    indexing, per-bit compare, shift sum)."""
    return (
        _DHASH_PX_CTES
        + f"""hsh AS (
      SELECT media_id,
        {_dhash_word_sql(_dhash_h_cmp())}
        AS dhash
      FROM m
    )"""
    )


def _dhash128_ctes() -> str:
    """CTE network for the 126-bit gates: both dhash128_media words
    (horizontal + vertical gradient) over the same constructed PPMs."""
    return (
        _DHASH_PX_CTES
        + f"""hsh AS (
      SELECT media_id,
        {_dhash_word_sql(_dhash_h_cmp())}
        AS dhash0,
        {_dhash_word_sql(_dhash_v_cmp())}
        AS dhash1
      FROM m
    )"""
    )


def _dhash_media(spark, sf_dir):
    """Spark-side construction mirrored by _dhash_ctes' raw/m CTEs."""
    docs = load_par(spark, sf_dir, "documents")
    base = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    j = docs.select("doc_id").join(
        base, F.col("bid") == F.col("doc_id") - F.col("doc_id") % 2
    )
    px0 = F.expr("substring(repeat(md5(btext), 27), 1, 840)")
    j = j.withColumn("px0", px0)
    px = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.expr("char(ascii(substring(px0, 1, 1)) + 1)"),
            F.expr("substring(px0, 2)"),
        ),
    ).otherwise(F.col("px0"))
    header = "P6\n20 14\n255\n"
    return j.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(
            F.encode(F.lit(header), "UTF-8"), F.encode(px, "UTF-8")
        ).alias("content"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )


@q(
    "image_dhash",
    "WITH " + _dhash_ctes() + """
    SELECT media_id, 'ppm' AS codec, dhash FROM hsh
    """,
    "data",
)
def q_image_dhash(spark, sf_dir):
    """Perceptual image hashing under the gate (r8): every document's
    constructed 20x14 PPM goes through multimodal.dhash_media (real
    netpbm parse + numpy grid gather) and the 63-bit hash is
    value-hashed against the generated SQL mirror of the same integer
    arithmetic — grayscale div, grid floor indexing, per-bit compare,
    shift sum. Bit-exact cross-engine by construction (no floats
    anywhere). Map-only: one mapInPandas pass, no shuffle."""
    from sonnerie_spark.operators import multimodal

    return multimodal.dhash_media(_dhash_media(spark, sf_dir))


@q(
    "image_dhash_neardup",
    "WITH " + _dhash_ctes() + """
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           cast(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM hsh a JOIN hsh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 2
    """,
    "data",
)
def q_image_dhash_neardup(spark, sf_dir):
    """Image near-duplicate pairs by perceptual hash (r8): the
    constructed (2k, 2k+1) couples share a base image with a
    one-pixel perturbation, so every couple must surface at hamming
    <= 1 — and dedup.hamming_near_pairs finds them with pigeonhole
    chunk blocking (3 chunks of 21 bits for max_hamming=2: a pair
    within budget leaves >= 1 chunk untouched), never an all-pairs
    join. The oracle is the brute-force self-join over the mirrored
    hashes, so the gate proves both the hash and that the blocked
    plan misses nothing."""
    from sonnerie_spark.operators import dedup as dedup_ops
    from sonnerie_spark.operators import multimodal

    hashes = multimodal.dhash_media(_dhash_media(spark, sf_dir))
    return dedup_ops.hamming_near_pairs(
        hashes, "media_id", "dhash", bits=63, max_hamming=2
    )


@q(
    "image_dhash128",
    "WITH " + _dhash128_ctes() + """
    SELECT media_id, 'ppm' AS codec, dhash0, dhash1 FROM hsh
    """,
    "data",
)
def q_image_dhash128(spark, sf_dir):
    """Wide (126-bit) perceptual hashing under the gate (r9): every
    constructed PPM goes through multimodal.dhash128_media and BOTH
    63-bit words — horizontal gradient (dhash_media's) plus the
    vertical-gradient word over a 9x8 grid — are value-hashed against
    the generated SQL mirror of the same integer arithmetic. The two
    words are unpacked to BIGINT columns for the typed compare
    (list-typed results would hash, but scalar columns exercise the
    driver's width lattice). Map-only: one mapInPandas pass."""
    from sonnerie_spark.operators import multimodal

    out = multimodal.dhash128_media(_dhash_media(spark, sf_dir))
    return out.select(
        "media_id",
        "codec",
        F.element_at("dhash", 1).alias("dhash0"),
        F.element_at("dhash", 2).alias("dhash1"),
    )


@q(
    "image_dhash128_neardup",
    "WITH " + _dhash128_ctes() + """
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           cast(bit_count(xor(a.dhash0, b.dhash0))
                + bit_count(xor(a.dhash1, b.dhash1)) AS INTEGER)
             AS hamming
    FROM hsh a JOIN hsh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash0, b.dhash0))
          + bit_count(xor(a.dhash1, b.dhash1)) <= 2
    """,
    "data",
)
def q_image_dhash128_neardup(spark, sf_dir):
    """Image near-dup pairs at 128-bit hash width (r9, the r8-verdict
    ask): dedup.hamming_near_pairs_words blocks the 126-bit two-word
    hashes with the same pigeonhole guarantee — 3 chunks, each inside
    one word (divmod(3, 2) gives word 0 chunks of 32 and 31 bits and
    word 1 its full 63 bits), so a pair within max_hamming=2 shares
    >= 1 chunk value and the equi-join finds it;
    the verify sums bit_count(xor) across words. The oracle is the
    brute-force self-join over both mirrored words, so the gate proves
    the second word's arithmetic AND that the multi-word blocked plan
    misses nothing. Doubling hash width squares the single-word
    false-candidate rate at the same plan cost — the scale argument
    for 128-bit perceptual hashes."""
    from sonnerie_spark.operators import dedup as dedup_ops
    from sonnerie_spark.operators import multimodal

    hashes = multimodal.dhash128_media(_dhash_media(spark, sf_dir))
    return dedup_ops.hamming_near_pairs_words(
        hashes, "media_id", "dhash", words=2, max_hamming=2
    )


@q(
    "gopher_quality_filter",
    r"""
    WITH base AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 5 = 0
                     THEN ' ## # ... # ... #' ELSE '' END
             || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || '- bullet one' || chr(10)
                          || '- bullet two' ELSE '' END
             || CASE WHEN doc_id % 4 = 0
                     THEN chr(10) || 'to be continued...' ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                     THEN ' and that have with the' ELSE '' END AS t
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             regexp_split_to_array(trim(t), '\s+') AS w,
             string_split(t, chr(10)) AS ln,
             len(regexp_extract_all(t, '#')) AS nhash,
             len(regexp_extract_all(t, '\.\.\.')) AS nell
      FROM base
    ),
    m AS (
      SELECT doc_id,
             len(w) AS n_words,
             list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w)
               AS mean_wl,
             nhash * 1.0 / len(w) AS hash_ratio,
             nell * 1.0 / len(w) AS ell_ratio,
             len(list_filter(ln, l -> regexp_matches(ltrim(l), '^[-*•]')))
               * 1.0 / len(ln) AS bullet_frac,
             len(list_filter(ln,
                 l -> regexp_matches(rtrim(l), '(\.\.\.|…)$')))
               * 1.0 / len(ln) AS ellipsis_frac,
             len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               * 1.0 / len(w) AS alpha_frac,
             len(list_filter(
                 ['the','be','to','of','and','that','have','with'],
                 s -> list_contains(list_transform(w, x -> lower(x)), s)))
               AS stop_hits
      FROM feat
    )
    SELECT doc_id AS id, cast(n_words AS INTEGER) AS n_words,
           floor(mean_wl * 1e6 + 0.5) / 1e6 AS mean_word_len,
           floor(hash_ratio * 1e6 + 0.5) / 1e6 AS hash_word_ratio,
           floor(ell_ratio * 1e6 + 0.5) / 1e6 AS ellipsis_word_ratio,
           floor(bullet_frac * 1e6 + 0.5) / 1e6 AS bullet_frac,
           floor(ellipsis_frac * 1e6 + 0.5) / 1e6 AS ellipsis_frac,
           floor(alpha_frac * 1e6 + 0.5) / 1e6 AS alpha_frac,
           cast(stop_hits AS INTEGER) AS stop_hits,
           (n_words >= 50 AND n_words <= 100000
            AND mean_wl >= 3.0 AND mean_wl <= 10.0
            AND hash_ratio < 0.1 AND ell_ratio < 0.1
            AND bullet_frac < 0.9
            AND ellipsis_frac < 0.3 AND alpha_frac >= 0.8
            AND stop_hits >= 2) AS keep
    FROM m
    """,
    "data",
)
def q_gopher_quality_filter(spark, sf_dir):
    """Gopher quality rules (Rae et al. 2021, published appendix A) —
    the standard pre-training document filter: word-count bounds, mean
    word length, symbol-to-word ratio, bullet/ellipsis line fractions,
    alphabetic-word fraction, and a distinct-stopword floor, with
    ``keep`` their conjunction. The gate injects doc-dependent rule
    triggers in BOTH engines (symbol runs into every 5th doc, bullet
    lines into every 3rd, an ellipsis line into every 4th, stopwords
    into every 2nd — odd docs mostly fail the 2-stopword floor, short
    docs fail the word floor) so every rule branch discriminates, and
    value-hashes all eight feature columns plus the verdict. Pure
    Catalyst array ops — no explode, no shuffle, no Python; scan-speed
    per-document cost at any corpus size. No reference analogue;
    training-data-pipeline extension surface."""
    from sonnerie_spark.operators.text import gopher_quality

    docs = load_par(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" ## # ... # ... #"))
            .otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\n- bullet one\n- bullet two"),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 4 == 0, F.lit("\nto be continued..."))
            .otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" and that have with the")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return gopher_quality(docs, "doc_id", "text")


@q(
    "c4_line_clean",
    r"""
    WITH page AS (
      SELECT doc_id,
             substr(text, 1, 40) || '.' || chr(10)
             || 'Too short.' || chr(10)
             || substr(text, 41, 80) || ' end of part two!' || chr(10)
             || CASE WHEN doc_id % 4 = 0
                     THEN 'Enable JavaScript to view this page.' || chr(10)
                     ELSE '' END
             || substr(text, 121, 60) || ' is this a question? Yes it is?'
             || CASE WHEN doc_id % 7 = 0
                     THEN chr(10) || 'lorem ipsum dolor' ELSE '' END
             || CASE WHEN doc_id % 9 = 0
                     THEN chr(10) || 'var x = { a: 1 };' ELSE '' END AS t
      FROM documents
    ),
    f AS (
      SELECT doc_id, t,
             string_split(t, chr(10)) AS ln,
             list_filter(string_split(t, chr(10)),
               l -> regexp_matches(rtrim(l), '[.!?"]$')
                    AND len(regexp_split_to_array(trim(l), '\s+')) >= 5
                    AND NOT contains(lower(l), 'javascript')) AS kept
      FROM page
    )
    SELECT doc_id AS id,
           array_to_string(kept, chr(10)) AS text,
           cast(len(kept) AS INTEGER) AS n_kept,
           cast(len(ln) - len(kept) AS INTEGER) AS n_removed,
           (len(kept) >= 3
            AND NOT contains(lower(t), 'lorem ipsum')
            AND NOT contains(t, '{')) AS keep
    FROM f
    """,
    "data",
)
def q_c4_line_clean(spark, sf_dir):
    """C4 line-level cleaning (Raffel et al. 2020, published section
    2.2): keep lines ending in terminal punctuation with >= 5 words and
    no 'javascript' mention; drop the whole page when < 3 lines survive
    or it contains 'lorem ipsum' or '{'. The gate builds a multi-line
    page from each document in BOTH engines — a sentence-terminated
    head, a too-short line, a javascript line on every 4th doc, a
    lorem-ipsum tail on every 7th, a code line with '{' on every 9th —
    so each rule kills a known line/page subset, and value-hashes the
    full cleaned text. Entirely map-side Catalyst (split -> filter ->
    array_join): no explode, no shuffle, no Python — scan-speed at any
    corpus size. No reference analogue; training-data-pipeline
    extension surface."""
    from sonnerie_spark.operators.text import c4_clean

    docs = load_par(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring(F.col("text"), 1, 40),
            F.lit(".\nToo short.\n"),
            F.substring(F.col("text"), 41, 80),
            F.lit(" end of part two!\n"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("Enable JavaScript to view this page.\n"),
            ).otherwise(F.lit("")),
            F.substring(F.col("text"), 121, 60),
            F.lit(" is this a question? Yes it is?"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("\nlorem ipsum dolor"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 9 == 0, F.lit("\nvar x = { a: 1 };"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return c4_clean(docs, "doc_id", "text")


def _para_page(docs):
    """The duplicate-rich 5-paragraph page both paragraph-dedup gates
    build (mirrored in their oracles' `page` CTE): a header shared by
    ALL docs, 7 footer variants, an exempt empty line, two per-doc
    text slices, and a within-doc repeat of the first slice on every
    5th doc."""
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("Subscribe to our newsletter!"),
            F.substring("text", 1, 60),
            F.lit(""),
            F.concat(
                F.lit("Footer variant "),
                (F.col("doc_id") % 7).cast("string"),
            ),
            F.concat(
                F.substring("text", 61, 50),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.lit("\n"), F.substring("text", 1, 60)),
                ).otherwise(F.lit("")),
            ),
        ).alias("t"),
    )


@q(
    "dedup_paragraphs",
    r"""
    WITH page AS (
      SELECT doc_id,
             'Subscribe to our newsletter!' || chr(10)
             || substr(text, 1, 60) || chr(10)
             || chr(10)
             || 'Footer variant ' || (doc_id % 7) || chr(10)
             || substr(text, 61, 50)
             || CASE WHEN doc_id % 5 = 0
                     THEN chr(10) || substr(text, 1, 60) ELSE '' END AS t
      FROM documents
    ),
    l AS (SELECT doc_id, string_split(t, chr(10)) AS ln FROM page),
    p AS (
      SELECT doc_id, generate_subscripts(ln, 1) - 1 AS pos,
             unnest(ln) AS para
      FROM l
    ),
    d AS (
      SELECT doc_id, pos, para,
             CASE WHEN length(trim(para)) >= 1 THEN md5(para)
                  ELSE 'u#' || doc_id || '#' || pos END AS h
      FROM p
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
                  AS rn
      FROM d
    )
    SELECT doc_id AS id,
           coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
                               ORDER BY pos), '') AS text,
           cast(count(*) AS INTEGER) AS n_paragraphs,
           cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INTEGER)
             AS n_removed
    FROM r GROUP BY doc_id
    """,
    "data",
)
def q_dedup_paragraphs(spark, sf_dir):
    """Corpus-wide exact paragraph dedup (C4/RefinedWeb line dedup,
    Raffel et al. 2020 §2.2): every paragraph keeps only its first
    occurrence by (doc_id, position); later copies are removed and
    documents reassembled in order. The gate builds a 5-paragraph page
    per document in BOTH engines with known duplicate structure — a
    header shared by ALL docs (only doc 0 keeps it), 7 footer variants
    (7 survivors corpus-wide), an empty line (exempt below min_chars,
    kept everywhere), two per-doc text slices, and a within-doc repeat
    of the first slice on every 5th doc — and value-hashes the full
    reassembled text plus the removal counts. Plan: one explode + ONE
    corpus shuffle keyed on md5(paragraph) for the first-occurrence
    window (fixed-width key; exempt rows get per-row unique keys so
    short lines can't skew one partition) + the per-doc reassembly agg.
    No reference analogue; training-data-pipeline extension surface."""
    from sonnerie_spark.operators.text import dedup_paragraphs

    docs = load_par(spark, sf_dir, "documents")
    return dedup_paragraphs(_para_page(docs), "doc_id", "t")


@q(
    "dedup_paragraphs_incremental",
    # gate_only like the other stateful-lifecycle gates: each execution
    # creates and mutates a fresh on-disk index.
    r"""
    WITH page AS (
      SELECT doc_id,
             'Subscribe to our newsletter!' || chr(10)
             || substr(text, 1, 60) || chr(10)
             || chr(10)
             || 'Footer variant ' || (doc_id % 7) || chr(10)
             || substr(text, 61, 50)
             || CASE WHEN doc_id % 5 = 0
                     THEN chr(10) || substr(text, 1, 60) ELSE '' END AS t
      FROM documents
    ),
    l AS (SELECT doc_id, string_split(t, chr(10)) AS ln FROM page),
    p AS (
      SELECT doc_id, generate_subscripts(ln, 1) - 1 AS pos,
             unnest(ln) AS para
      FROM l
    ),
    d AS (
      SELECT doc_id, pos, para, doc_id % 2 AS b,
             CASE WHEN length(trim(para)) >= 1 THEN md5(para)
                  ELSE 'u#' || doc_id || '#' || pos END AS h
      FROM p
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY h
                                   ORDER BY b, doc_id, pos) AS rn
      FROM d
    )
    SELECT doc_id AS id,
           coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
                               ORDER BY pos), '') AS text,
           cast(count(*) AS INTEGER) AS n_paragraphs,
           cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INTEGER)
             AS n_removed
    FROM r GROUP BY doc_id
    """,
    "data",
    gate_only=True,
)
def q_dedup_paragraphs_incremental(spark, sf_dir):
    """Rolling-ingestion paragraph dedup through the persistent
    ExactIndex: the same duplicate-rich pages arrive as two batches
    (even doc_ids, then odd); each batch loses every paragraph the
    index already holds plus its own internal repeats, WITHOUT
    rescanning batch 1 (partition-pruned hash probe). The union of the
    two outputs must equal a one-shot keep-first pass ordered by
    (batch, doc_id, pos) — which the oracle computes set-wise, and
    which provably DIFFERS from the one-shot `dedup_paragraphs` gate
    (footer keepers become the lowest EVEN ids), so batch precedence
    is actually exercised. No reference analogue;
    training-data-pipeline extension surface."""
    from sonnerie_spark.operators.dedup import ExactIndex
    from sonnerie_spark.operators.text import dedup_paragraphs_incremental

    docs = load_par(spark, sf_dir, "documents")
    page = _para_page(docs)
    idx = ExactIndex(spark, _gate_tmp("paridx_gate_"))
    b0 = dedup_paragraphs_incremental(
        idx, page.filter(F.col("doc_id") % 2 == 0), "doc_id", "t"
    )
    b1 = dedup_paragraphs_incremental(
        idx, page.filter(F.col("doc_id") % 2 == 1), "doc_id", "t"
    )
    return b0.unionByName(b1)


@q(
    "classifier_score",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    wt AS (
      SELECT doc_id,
             ({phash_salted_sql("tok", 97)} % 2001) - 1000 AS w
      FROM tok
    ),
    s AS (
      SELECT doc_id, sum(w) AS ssum, count(*) AS n
      FROM wt GROUP BY doc_id
    )
    SELECT doc_id AS id,
           cast(n AS INTEGER) AS n_tokens,
           cast(ssum AS BIGINT) AS score_sum,
           cast(floor(ssum * 1000.0 / greatest(n, 1)) AS BIGINT)
             AS score_milli,
           (n > 0 AND floor(ssum * 1000.0 / greatest(n, 1)) >= 0) AS keep
    FROM s
    """,
    "data",
)
def q_classifier_score(spark, sf_dir):
    """Model-based quality filtering (the DCLM / FineWeb-Edu step: a
    cheap linear classifier scores every document; keep above a
    threshold). The gate runs the hashed-weight form — each token
    weighs phash(97#tok) % 2001 - 1000, the deterministic stand-in the
    oracle replays exactly — whose plan is entirely MAP-ONLY: the sum
    folds over the token array in place (no explode, no shuffle), the
    shape a hashed-feature classifier keeps at any corpus size.
    score_milli = floor(1000 * sum / n) is a floor of an exact-IEEE
    quotient of exact integers, so both engines agree bit-for-bit.
    The trained-weights form (broadcast vocabulary join) is pinned by
    pytest to equal this one when fed the same weights. No reference
    analogue; training-data-pipeline extension surface."""
    from sonnerie_spark.operators.text import classifier_score

    docs = load_par(spark, sf_dir, "documents")
    return classifier_score(docs, "doc_id", "text")


@q(
    "dedup_substrings",
    f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN 'this work is licensed under the creative '
                       || 'commons attribution license ' || text
                  ELSE text END AS tx
      FROM documents
    ),
    toks AS (SELECT doc_id, regexp_split_to_array(trim(tx), '\\s+') AS t FROM base),
    spans AS (
      SELECT doc_id, unnest(range(greatest(len(t) - 7, 0))) AS pos, t
      FROM toks WHERE len(t) >= 8
    ),
    hashed AS (
      SELECT doc_id, pos,
             {phash_sql("array_to_string(t[pos+1:pos+8], ' ')")} AS span_h
      FROM spans
    ),
    freq AS (
      SELECT span_h FROM (SELECT DISTINCT doc_id, span_h FROM hashed)
      GROUP BY span_h HAVING count(*) >= 2
    ),
    fl AS (
      SELECT doc_id, list_sort(list(pos)) AS fp
      FROM hashed JOIN freq USING (span_h) GROUP BY doc_id
    ),
    j AS (
      SELECT t.doc_id, t.t, coalesce(f.fp, []) AS fp
      FROM toks t LEFT JOIN fl f USING (doc_id)
    ),
    r AS (
      SELECT doc_id, t,
             list_filter(range(len(t)),
               i -> len(list_filter(fp,
                        p -> p <= i AND i <= p + 7)) = 0) AS ki
      FROM j
    )
    SELECT doc_id AS id,
           -- duckdb: array_to_string([]) is NULL, not '' (spark's '')
           coalesce(
             array_to_string(list_transform(ki, i -> t[i+1]), ' '), ''
           ) AS text,
           cast(len(t) - len(ki) AS INTEGER) AS n_removed
    FROM r
    """,
    "data",
)
def q_dedup_substrings(spark, sf_dir):
    """ExactSubstr substring dedup (Lee et al. 2021, arXiv 2107.06499):
    REMOVE every token covered by an 8-token span occurring in >= 2
    distinct documents — the removal pass on top of repeated_spans'
    flagging pass, the published method that strips licence headers and
    copy-pasted passages while keeping each document's unique
    remainder. The gate prepends a shared 10-token licence header to
    every 3rd doc in BOTH engines: spans fully inside the header become
    corpus-frequent, so exactly the header tokens (plus any naturally
    repeated spans) must vanish, and the full cleaned text is
    value-hashed. Plan: repeated_spans' span-hash stream + map-side df
    agg (no pair path), one per-doc flagged-position array, one
    map-side index filter."""
    docs = load_par(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(
                    "this work is licensed under the creative "
                    "commons attribution license "
                ),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return textops.dedup_substrings(
        docs, "doc_id", "text", k=8, min_df=2, materialize=True
    )


# A small valid BPE merge table (each multi-char operand produced by an
# earlier merge) over the corpus' English function-word characters.
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "u"), ("c", "o"),
]


def _bpe_oracle() -> str:
    """DuckDB mirror of text.bpe_encode's replace chain (chr(1)/chr(2)
    token open/close marks) for the _BPE_MERGES table."""
    s = (
        "regexp_replace(trim(regexp_replace(text, '\\s+', ' ', 'g')),"
        " '(.)', chr(1) || '\\1' || chr(2), 'g')"
    )
    s = f"replace({s}, chr(1) || ' ' || chr(2), ' ')"
    for a, b in _BPE_MERGES:
        pat = f"chr(1)||'{a}'||chr(2)||chr(1)||'{b}'||chr(2)"
        s = f"replace({s}, {pat}, chr(1)||'{a}{b}'||chr(2))"
    s = f"replace({s}, chr(2)||' '||chr(1), chr(2)||chr(1))"
    s = f"regexp_replace({s}, '^\\x01|\\x02$', '', 'g')"
    return f"""
    WITH enc AS (
      SELECT doc_id, string_split({s}, chr(2)||chr(1)) AS toks
      FROM documents
    )
    SELECT doc_id AS id,
           array_to_string(toks, '+') AS toks,
           cast(len(toks) AS INTEGER) AS n_tokens
    FROM enc
    """


@q(
    "bpe_train",
    textops.bpe_train_sql("documents", "text", num_merges=8),
    "data",
)
def q_bpe_train(spark, sf_dir):
    """BPE tokenizer TRAINING end-to-end (Sennrich et al. 2016): learn
    8 merges from the documents corpus — the training side whose apply
    side is bpe_encode and whose single counting step is
    bpe_pair_counts. The oracle replays the full greedy loop as a
    chained-CTE DuckDB query (stage k's argmax feeds stage k+1's
    replace), so any drift in counting, tie-breaks, or the
    non-overlapping merge application breaks the gate. Scale: the
    corpus collapses to the distinct-word table in ONE scan; each
    iteration is a vocab-sized hash agg + a 1-row argmax collect + a
    map-only replace."""
    learned = textops.bpe_train(
        load_par(spark, sf_dir, "documents"), "text", num_merges=8
    )
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(learned)],
        "rk int, a string, b string, n long",
    )


@q("bpe_encode", _bpe_oracle(), "data")
def q_bpe_encode(spark, sf_dir):
    """BPE tokenizer APPLICATION (Sennrich et al. 2016): encode every
    document with a fixed 8-merge table — the downstream half of the
    tokenizer story whose training half is bpe_pair_counts. The
    operator exploits the merge-table validity invariant to express the
    classic iterative encoder as one replace-all pass per merge over
    open/close-delimited tokens (map-side Catalyst chain, no Python, no
    shuffle; pytest-pinned against an independent iterative-BPE model).
    The gate value-hashes the full '+'-joined token stream of every
    document plus the token count, with the identical replace chain
    mirrored in DuckDB."""
    enc = textops.bpe_encode(
        load_par(spark, sf_dir, "documents"), "doc_id", "text", _BPE_MERGES
    )
    return enc.select(
        "id",
        F.array_join("tokens", "+").alias("toks"),
        "n_tokens",
    )


@q(
    "bm25_topk",
    f"""
    WITH docs AS (
      SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS t,
             len(regexp_split_to_array(trim(text), '\\s+')) AS dl
      FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM docs),
    q AS (
      SELECT id AS q_id, array_to_string(t[1:5], ' ') AS q_text
      FROM docs WHERE id < 5
    ),
    qterms AS (
      SELECT DISTINCT q_id, unnest(string_split(q_text, ' ')) AS term
      FROM q
    ),
    postings AS (
      SELECT id, dl, term, count(*) AS tf
      FROM (SELECT id, dl, unnest(t) AS term FROM docs)
      GROUP BY id, dl, term
    ),
    qvocab AS (SELECT DISTINCT term FROM qterms),
    p_q AS (SELECT p.* FROM postings p JOIN qvocab USING (term)),
    dfreq0 AS (SELECT term, count(*) AS df FROM p_q GROUP BY term),
    -- idf arg per term; the ln is expanded by ln_cr_sql into the same
    -- correctly-rounded-ops-only series the Spark side computes (JVM
    -- Math.log vs libm ln can differ 1 ulp; sqrt/+,-,*,/ cannot)
    dfreq AS (
      SELECT term, df,
             1 + (s.n_docs - df + 0.5) / (df + 0.5) AS x
      FROM dfreq0, stats s
    ),
    matched AS (
      SELECT qt.q_id, p.id,
             cast(floor(
               {textops.ln_cr_sql("d.x")}
               * (p.tf * 2.2)
               / (p.tf + 1.2 * (0.25 + 0.75
                    * (p.dl / (cast(s.sum_dl AS double) / s.n_docs))))
               * 1e6 + 0.5) AS bigint) AS c_q6
      FROM p_q p
      JOIN qterms qt USING (term)
      JOIN dfreq d USING (term), stats s
    ),
    scored AS (
      -- cast: DuckDB widens sum(BIGINT) to HUGEINT (int128); Spark's
      -- F.sum stays BIGINT, and a typed driver hash flips on the width
      -- even when every value is identical (the r7 driver-red cause).
      SELECT q_id, id, cast(sum(c_q6) AS BIGINT) AS score_q6
      FROM matched GROUP BY q_id, id
    )
    SELECT q_id, id, score_q6, rk FROM (
      SELECT q_id, id, score_q6,
             cast(row_number() OVER (
               PARTITION BY q_id ORDER BY score_q6 DESC, id) AS INTEGER) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    "data",
)
def q_bm25_topk(spark, sf_dir):
    """BM25 lexical retrieval (Robertson & Zaragoza 2009): top-5 corpus
    documents for each of 5 queries built from docs 0-4's first five
    tokens — the lexical complement to the embedding ANN gates. Each
    term contribution is a deterministic IEEE expression of exact
    integers (tf, df, dl, N) plus the exact ratio sum(dl)/N, rounded to
    a 1e-6-scaled BIGINT before the per-(query, doc) sum, so the score
    and ranking are bit-exact in any summation order and any engine
    (the int8-dot-product contract). Scale: postings restricted to the
    query vocabulary BEFORE the df agg, every broadcast side
    query-bounded, corpus shuffled once for postings."""
    from sonnerie_spark.operators.text import bm25_topk, tokens

    docs = load_par(spark, sf_dir, "documents")
    qdf = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 5), " ").alias(
            "q_text"
        ),
    )
    return bm25_topk(docs, qdf, top_k=5)


@q(
    "corpus_mix_budget",
    f"""
    WITH tok AS (
      SELECT doc_id, source,
             cast(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
               AS n_tokens
      FROM documents
    ),
    w(src, w) AS (VALUES ('src0', 5), ('src1', 3), ('src2', 2),
                         ('src3', 1), ('src4', 40)),
    tot AS (
      SELECT source AS src, sum(n_tokens) AS t_s
      FROM tok JOIN w ON tok.source = w.src GROUP BY source
    ),
    b AS (SELECT sum(t_s) // 2 AS budget FROM tot)
    SELECT t.doc_id AS id, t.source, t.n_tokens
    FROM tok t JOIN tot ON t.source = tot.src
    JOIN w ON t.source = w.src, b
    WHERE cast({phash_sql("cast(t.doc_id AS varchar)")} % 1000000 AS hugeint)
            * cast(tot.t_s AS hugeint) * 51
          < cast(1000000 AS hugeint) * cast(b.budget AS hugeint)
            * cast(w.w AS hugeint)
    """,
    "data",
)
def q_corpus_mix_budget(spark, sf_dir):
    """Token-budget mixture sampling: draw ~half the five weighted
    sources' tokens at 5:3:2:1:40 proportions — the "sample N tokens at
    these mixture weights" pass that sizes a training run. src4's
    weight pushes its target past its total, exercising the branchless
    keep-everything cap; the other four keep hash-stable fractions.
    The keep rule is pure integer arithmetic (decimal(38,0) /
    hugeint-widened), so membership is bit-exact cross-engine at every
    SF. Budget is derived from the data (sum of weighted sources'
    tokens // 2) via a 1-row bounded collect, mirrored by the oracle's
    subquery. Plan: one tiny token-total agg broadcast, then a map-only
    corpus filter — no corpus shuffle. r12: the full corpus TOKENIZATION
    ran THREE times per query (the budget collect, budget_mix's
    strict-guard collect, and the returned plan each re-evaluated the
    token projection — guide §2.4). Now the gate collects the tiny
    per-source totals ONCE and hands them to budget_mix via ``totals=``
    (one aggregation serves both the budget derivation and the strict
    guard), and the narrow 3-column projection sits behind the
    size-conditional ``_boundary``: pure recompute at gate scale (2
    tokenize passes), one tokenize + a narrow proxy-table spill at
    production row counts (guide §8 — decide on small rows)."""
    from sonnerie_spark.operators.text import tokens

    W = {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 40}
    spills: list = []
    docs = _boundary(
        load_par(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
        ),
        spills,
        "mixtok",
        sf_dir,
    )
    # coalesce(sum, 0): a degenerate source whose docs ALL have NULL
    # text sums to NULL and int(None) would raise (ADVICE r12) — zero
    # tokens is the honest total for such a source (its docs carry
    # NULL n_tokens and can never pass the keep filter anyway)
    totals = (
        docs.groupBy("source")
        .agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t_s"))
        .collect()
    )
    total = sum(int(r["t_s"]) for r in totals if r["source"] in W)
    out = sampling.budget_mix(
        docs, "source", "doc_id", "n_tokens",
        budget=total // 2, weights=W,
        totals=[(r["source"], int(r["t_s"])) for r in totals],
    )
    return _finish_composite(out, spills) if spills else out


# ---------------------------------------------------------------------------
# Driver-window ordering. The driver's CORRECTNESS gate checks the FIRST
# 50 registry rows; definition order above is pedagogical (parity ops,
# then analytics, then composites), which left the most load-bearing
# lifecycle/composite gates outside the window. Reorder so the window
# certifies: all 23-parity gates, the write/time-travel/rollup/LSH-index
# lifecycle roundtrips, and the composite curation pipelines. Everything
# not listed keeps its definition order after the window. A name listed
# here that no registered gate defines is a HARD import-time error —
# a silent skip would shrink the certified set without any signal.

_DRIVER_WINDOW = [
    # sonnerie parity surface (SURVEY §2.1)
    "scan_all", "key_lookup", "key_range", "key_wildcard", "time_range",
    "project_columns", "lww_merge", "delete_markers", "by_key_stats",
    "format_lines", "key_listing",
    # lifecycle roundtrips (write path, versioning, continuous aggs)
    "write_path_roundtrip", "time_travel_roundtrip", "sql_over_view",
    "rollup_cascade_roundtrip", "lsh_index_incremental",
    "dd_store_roundtrip",
    # Discretionary slots rotate each round under the standing
    # subsumption rule: a gate leaves the window only if a STRICTER
    # sibling stays in it (runs the departing gate's machinery plus
    # more), and every departed gate remains verified by the local
    # three-SF sweep (tools/check_correctness.py at sf0.001/0.01/0.1).
    # r7 rotation (VERDICT r6 #5: give never-driver-seen gates a
    # driver record — 10 swapped in this round):
    #   dedup_exact -> dedup_exact_incremental (the incremental
    #     ExactIndex batch runs the same exact-hash dedup THROUGH the
    #     persistent index — strict superset);
    #   neardup_components -> heavy_hitters_cms (neardup_keep_canonical
    #     stays and consumes the component stream);
    #   embedding_neardup_components -> kmv_source_overlap
    #     (neardup_keep_canonical certifies the CC rounds,
    #     semdedup_keep the embedding-space near-dup);
    #   embedding_topk_int8 -> lm_score_bigram (int8 topk is the
    #     composition of embedding_quantize_int8 + embedding_topk,
    #     both staying);
    #   ivf_ann_topk -> lm_bucket_split (ivf_pq_topk stays: the same
    #     IVF probe machinery plus the PQ ADC);
    #   pq_encode -> pq_ann_topk (pq_ann_topk runs the encode AND the
    #     ADC scan — strict superset);
    #   ann_lsh_buckets -> ivf_index_incremental (ivf_kmeans_assign
    #     stays: the same map-only embedding bucket-assignment plan
    #     class, plus the Lloyd's update round);
    #   text_quality -> c4_line_clean (gopher_quality_filter stays:
    #     the same token pipeline plus six more rule columns);
    #   train_test_split -> split_leakage (split_leakage composes
    #     hash_split WITH the LSH pair stream — strict superset);
    #   corpus_mix_temperature -> dsir_select (corpus_curation_v3
    #     stays and runs temperature_sample_sqrt as its mix stage).
    # r8 rotation (VERDICT r7 #3: 10 more first-time gates):
    #   bpe_encode -> bpe_train (the trainer runs tokens() + the
    #     \x01/\x02 marker replace chain — encode's core application
    #     machinery — inside the full counting/argmax loop; encode's
    #     final string_split render stays pinned by pytest + the
    #     three-SF sweep);
    #   lm_score_bigram -> lm_score_kneser_ney (same lm_vocab /
    #     lm_bigram_counts pipeline and per-doc scoring join, plus the
    #     KN continuation/discount tables);
    #   semdedup_keep -> quantile_sketch_dd (corpus_curation_v3 stays
    #     and runs similarity.semdedup as its semantic stage);
    #   pq_ann_topk -> quantile_by_key_dd (ivf_pq_topk stays: runs the
    #     PQ encode AND the ADC scan, plus the IVF probe);
    #   ivf_kmeans_assign -> distinct_sketch_by_group
    #     (ivf_index_incremental stays: build() runs the same
    #     integer-exact Lloyd's assign+update round, persisted);
    #   embedding_topk -> dd_store_roundtrip (ivf_index_incremental
    #     stays: at nprobe == num_centroids its topk IS exact
    #     brute-force cosine top-k — the same ranking identity, gated);
    #   neardup_keep_canonical -> ivfpq_index_incremental
    #     (corpus_curation_v3 stays and runs minhash_lsh_pairs ->
    #     connected_components -> keep_canonical_per_component; the
    #     hot-bucket cap stays via dedup_minhash_lsh_capped);
    #   continuous_rollup_roundtrip -> tfidf_top_terms
    #     (rollup_cascade_roundtrip stays: builds the fine rollup from
    #     source with the same refresh machinery, then cascades);
    #   multimodal_decode_real -> multimodal_resize_real (the resize
    #     gate parses the same real P6 PPM bytes, then transforms —
    #     decode_real's WAV half moves to the incoming resample gate);
    #   multimodal_meta -> multimodal_resample_real (meta's encode +
    #     byte-length plumbing is run by multimodal_resize_real's
    #     construction/output; its md5 digest by
    #     dedup_exact_incremental's content hashing — both staying).
    # r10 rotation (VERDICT r9 #2: the seven r9-landed gates plus the
    # three riskiest never-driver-validated codec gates get their first
    # driver record). Departures and their covers — strong subsumption
    # where available, otherwise the departing gate holds r8+r9 driver
    # records and its NARROW residual (named) is pinned by pytest + the
    # three-SF local sweep:
    #   corpus_curation_v4 -> corpus_curation_v5 (STRICT: v5 runs v4's
    #     decontaminate stage verbatim, then the classifier predicate,
    #     then the same full v3 chain — v4 minus nothing);
    #   image_dhash -> image_dhash128 and
    #   image_dhash_neardup -> image_dhash128_neardup (the 128-bit
    #     gates run the same decode + the horizontal word PLUS the
    #     vertical word, and the same words-blocked hamming pair plan);
    #   dedup_exact_incremental -> dedup_paragraphs_incremental (the
    #     incoming gate runs ExactIndex seen/append through the same
    #     prefix-pruned persistent layout at paragraph granularity;
    #     residual = add()'s own batch-dedup agg, pinned by pytest +
    #     the exact gate's r8+r9 records);
    #   kmv_source_overlap -> dedup_paragraphs (kmv_merge_halves stays:
    #     the same KMV bottom-k build twice plus the merge identity;
    #     residual = the overlap/Jaccard arithmetic on two sketches —
    #     three driver records r7/r8/r9);
    #   heavy_hitters_cms -> simhash120_near_pairs (cms_merge_halves
    #     stays: the same CMS build twice plus the merge; residual =
    #     the top-k heavy-hitter extraction window — three driver
    #     records r7/r8/r9);
    #   ivf_index_incremental -> classifier_score
    #     (ivfpq_index_incremental stays: the same integer-exact IVF
    #     assign/build through the persistent index plus the PQ ADC
    #     scan and incremental add);
    #   multimodal_resize_real -> multimodal_decode_png (resize holds
    #     r8+r9 records; residual = the box-filter transform — its P6
    #     parse spine is the decode family's, and the incoming gate is
    #     the riskiest never-driver-validated class: a from-scratch
    #     inflate/defilter PNG codec);
    #   multimodal_resample_real -> multimodal_decode_mp3 (resample
    #     holds r8+r9 records; residual = the linear resampler — its
    #     WAV parse spine stays pinned by pytest; incoming gate runs
    #     the MP3 frame-header walk);
    #   distinct_sketch_by_group -> multimodal_decode_jpeg
    #     (hll_merge_halves stays: the same HLL register build plus
    #     the merge; residual = the per-group keying — r8+r9 records;
    #     incoming gate runs the from-scratch baseline JPEG decoder).
    # r11 rotation (VERDICT r10 #2: the pinned r11 ten — the analytics
    # window family, the codec tail, and fold_series, the gate whose
    # read path r10's row-group work touched most). Departures and
    # their covers — strong subsumption where available, otherwise the
    # departing gate holds >=2 driver records and its NARROW residual
    # (named) is pinned by pytest + the three-SF local sweep:
    #   decontaminate_bloom -> strip_boilerplate (STRICT cover:
    #     corpus_curation_v5 stays and runs v4's decontaminate-bloom
    #     stage verbatim — explode, broadcast word-table joins,
    #     broadcast anti-join; departing gate also holds r9+r10
    #     records);
    #   dd_merge_grouped -> ohlc_1h (dd_store_roundtrip stays: add()
    #     runs the same DD bucket-index build and merge() the same
    #     register combine through the persistent store; residual =
    #     the per-group merge keying — r9+r10 records);
    #   bloom_filter_membership -> gap_fill_locf (bloom_store_roundtrip
    #     stays: the roundtrip builds the same Kirsch-Mitzenmacher
    #     bit-array AND probes membership through the persistent form;
    #     departing gate holds r9+r10 records);
    #   hll_merge_halves -> time_weighted_avg (r9+r10 records; residual
    #     = the register-max merge identity, pinned by the sketch-merge
    #     pytest matrix + three-SF sweep; the HLL register build also
    #     runs inside distinct_sketch_by_group, r8+r9 records);
    #   cms_merge_halves -> fold_series (r9+r10 records; residual = the
    #     counter-sum merge identity, same pytest matrix + sweep);
    #   kmv_merge_halves -> normalize_text (r9+r10 records; residual =
    #     the bottom-k union merge, same pytest matrix + sweep);
    #   bpe_train -> multimodal_decode_gif (r8+r9+r10 records; residual
    #     = the merge-pair counting/argmax loop, pinned by
    #     test_lm/test_text BPE tests + sweep; bpe encode/apply
    #     machinery also rides pack_sequences' token path, staying);
    #   lm_score_kneser_ney -> multimodal_decode_avi (r8+r9+r10
    #     records; residual = the KN continuation/discount tables over
    #     the shared lm_vocab/lm_bigram_counts spine, pinned by
    #     test_lm + sweep);
    #   embedding_quantize_int8 -> multimodal_frame_sample (r8+r9+r10
    #     records; residual = the symmetric int8 scale/round map-only
    #     projection, pinned by test_similarity + sweep;
    #     ivfpq_index_incremental stays and runs the heavier PQ
    #     quantization family);
    #   gopher_quality_filter -> multimodal_resize_png (r7..r10
    #     records; residual = the rule-column thresholds; the same
    #     token-stats pipeline runs inside c4_line_clean (staying) and
    #     the curation composites' quality stage — corpus_curation_v5
    #     staying).
    # r12 rotation (VERDICT r11 #1: the pinned r12 ten — the analytics
    # window/funnel family, the repetition/chunking text family, and
    # the sampling trio). Departures hold 4-11 driver records each
    # (counted from CORRECTNESS_r01..r11); covers/residuals:
    #   dedup_ngram_jaccard_capped -> dedup_ngram_containment (STRONG
    #     cover: the incoming gate runs the SAME k=3 shingle
    #     posting-list plan and max_df skew cap, scoring containment
    #     instead of Jaccard; departing gate holds 8 records r4-r11;
    #     residual = the Jaccard union term, pinned by
    #     test_ann_streaming's jaccard monotonicity tests + sweep);
    #   text_lang_id -> stratified_sample_lang (departing holds 11
    #     consecutive records r1-r11 — the longest streak in the
    #     registry; residual = the n-gram lang heuristic projection,
    #     pinned by pytest + the three-SF sweep; the incoming gate
    #     stratifies on the lang column, one shuffle on the group key);
    #   c4_line_clean -> repetition_filter (departing holds r7-r11;
    #     the token-stats spine also runs inside corpus_curation_v5's
    #     quality stage, staying; incoming runs the Gopher-style
    #     repeated-token-ratio rules over the same tokens() path);
    #   dedup_substrings -> repeated_spans (departing holds r6-r11;
    #     incoming runs the sibling within-doc repeated-window
    #     analysis over the same whitespace-token spine; residual =
    #     the cross-doc suffix posting join, pinned by substr_scale +
    #     pytest + sweep);
    #   decontaminate_benchmark -> cohort_retention (departing holds
    #     r5-r11; corpus_curation_v5 stays and runs the family's
    #     decontaminate-bloom stage; residual = the exact benchmark
    #     13-gram join variant, pinned by pytest + sweep);
    #   redact_pii -> funnel_conversion (departing holds r5-r11;
    #     residual = the regex redaction map-only projection, pinned
    #     by pytest + sweep);
    #   pack_sequences -> chunk_documents (departing holds r5-r11;
    #     incoming runs the same tokens -> fixed-window slicing spine
    #     (chunking IS packing's window stage at doc granularity);
    #     residual = the greedy bin accumulation, pinned by the
    #     pack_sequences invariants pytest + sweep);
    #   split_leakage -> cap_per_group (departing holds r7-r11; its
    #     LSH pair stream stays THREE ways — lsh_index_incremental in
    #     the window, corpus_curation_v5's LSH stage, pytest; residual
    #     = the hash_split composition, pinned by the split tests +
    #     sweep);
    #   corpus_mix_budget -> deterministic_shuffle (departing holds
    #     r6-r11; the integer hash-keep mix rule runs inside
    #     corpus_curation_v3's mix stage, staying via v5; residual =
    #     the token-budget allocation, pinned by pytest + sweep);
    #   dsir_select -> series_anomaly_zscore (departing holds r7-r11;
    #     residual = the DSIR importance-weight arithmetic, pinned by
    #     pytest + sweep; incoming is the window-family z-score gate
    #     over events, first of the analytics batch).
    # r13 rotation (VERDICT r12 item 1: the four r12-restructured
    # gates that were simultaneously rotated out — split_leakage,
    # corpus_mix_budget, dsir_select, dedup_ngram_jaccard_capped — get
    # their post-change driver record; plus the six never-driver-seen
    # gates the pinned r9-#4 schedule assigned to r13
    # (quality_filter_stratified, bpe_pair_counts, neardup_keep_longest,
    # corpus_curation, distinct_sketch_hll, multimodal_decode_stub);
    # plus lm_score_kneser_ney — the strictest gate of the LM family
    # whose vocabulary materialization r12 changed without a
    # driver-window record (it runs the full lm_vocab/lm_bigram_counts
    # spine lm_score_bigram/lm_bucket_split share, plus the KN
    # continuation/discount tables). Departures (record counts from
    # CORRECTNESS_r01..r12) and covers:
    #   classifier_score (3 records r10-r12) -> corpus_curation_v5
    #     stays (STRICT: v5 runs the classifier predicate stage
    #     verbatim over the decontaminated corpus);
    #   dedup_paragraphs (3 records r10-r12) ->
    #     dedup_paragraphs_incremental stays (the same paragraph-hash
    #     first-occurrence machinery THROUGH the persistent index;
    #     residual = the one-shot reassembly join, pinned by pytest +
    #     sweep);
    #   bm25_topk (7 records r4-r12, incl. the post-restructure r12
    #     record) -> residual = the BM25 ranking arithmetic, pinned by
    #     pytest + sweep; the tokens->tf/df counting spine runs inside
    #     dedup_ngram_containment (staying);
    #   fold_series, ohlc_1h, gap_fill_locf, time_weighted_avg (2
    #     records each, r11+r12; untouched since r11) -> the series
    #     view + window-agg spine stays via by_key_stats and the
    #     parity surface; residuals (fold identity, bucket OHLC, LOCF
    #     fill, time-weight integral) pinned by pytest + type_parity +
    #     sweep;
    #   normalize_text (2 records r11+r12) -> map-only regex
    #     projection; strip_boilerplate (staying) keeps the text-clean
    #     class; residual pinned by pytest + sweep;
    #   multimodal_decode_mp3 (3 records r10-r12) -> mp3codec is
    #     untouched this round; residual = the MP3 frame-header walk,
    #     pinned by pytest + sweep;
    #   multimodal_decode_png (3 records r10-r12) ->
    #     multimodal_resize_png stays (STRICT for the codec: full
    #     pngcodec decode AND re-encode AND re-decode in one chain);
    #   multimodal_decode_jpeg (3 records r10-r12) ->
    #     multimodal_decode_avi stays (runs the same jpegcodec
    #     baseline decode over every MJPEG first frame; residual = the
    #     standalone JPEG fixture build, pinned by pytest + sweep).
    # Never-driver-seen after the r13 rotation: none — every benched
    # gate now holds at least one driver record.
    # Earlier rotations retired (r6: ivf_assign,
    # embedding_neardup_pairs, dedup_ngram_jaccard, dedup_minhash_lsh,
    # dedup_simhash, text_token_stats, doc_fingerprint,
    # corpus_mix_uniform, corpus_curation_v2; r7: dedup_exact,
    # neardup_components, embedding_neardup_components,
    # embedding_topk_int8, ivf_ann_topk, pq_encode, ann_lsh_buckets,
    # text_quality, train_test_split, corpus_mix_temperature) — same
    # rule, see git history for the per-swap notes.
    # r9 rotation (VERDICT r8 #2: the ten r8-landed gates get their
    # first driver record). Departures and their covers — strong
    # subsumption where available, otherwise the departing gate holds
    # an r7/r8 driver record and its NARROW residual (named below) is
    # pinned by pytest + the three-SF local sweep:
    #   corpus_curation_v3 -> corpus_curation_v4 (STRICT: v4 calls
    #     _curation_v3_pipeline verbatim over the decontaminated
    #     corpus, plus the bloom stage);
    #   quantile_sketch_dd -> dd_merge_grouped (the incoming gate runs
    #     dd_sketch_grouped twice + dd_merge; the ungrouped build is
    #     the same bucket-index projection + hash agg, also run inside
    #     dd_store_roundtrip's add(), staying);
    #   quantile_by_key_dd -> hll_merge_halves (grouped dd build runs
    #     inside incoming dd_merge_grouped; residual =
    #     dd_group_quantile's per-group cumsum window);
    #   tfidf_top_terms -> bloom_filter_membership (bm25_topk stays:
    #     same tokens -> tf -> df -> idf counting spine plus the
    #     query-side ranking; residual = the per-doc top-terms window);
    #   corpus_mix_weighted -> decontaminate_bloom (corpus_mix_budget
    #     stays: budget_mix applies the same integer hash-keep rule of
    #     mix_sources_weighted plus the token-budget allocation; v4
    #     also runs the family's temperature stage);
    #   ivf_pq_topk -> bloom_store_roundtrip (ivfpq_index_incremental
    #     stays: runs PQ train/encode, IVF assign, and the
    #     partition-pruned ADC top-k through the persistent form, plus
    #     incremental add — the one-shot gate got driver records in
    #     r7 AND r8);
    #   dedup_minhash_lsh_capped -> cms_merge_halves (LSH pair
    #     machinery stays THREE times: lsh_index_incremental,
    #     split_leakage's pair stream, corpus_curation_v4's LSH stage;
    #     residual = the max_bucket_size cap branch);
    #   simhash_near_pairs -> image_dhash (incoming image_dhash_neardup
    #     runs the same hamming_near_pairs pigeonhole blocking;
    #     residual = the simhash signature projection, map-only);
    #   lm_bucket_split -> kmv_merge_halves (lm_score_kneser_ney stays:
    #     same lm_vocab/lm_bigram_counts build + per-doc scoring join;
    #     residual = the percentile-bucket window);
    #   rollup_multicol_roundtrip -> image_dhash_neardup
    #     (rollup_cascade_roundtrip stays: the same ContinuousRollup
    #     refresh/commit machinery, fine-from-source + cascaded merge;
    #     residual = the num_values=m multi-column agg struct).
    "dedup_paragraphs_incremental",
    "dedup_ngram_containment",
    "simhash120_near_pairs",
    "ivfpq_index_incremental",
    "bloom_store_roundtrip",
    # text / sampling pipeline (r12 rotation)
    "repetition_filter", "repeated_spans", "chunk_documents",
    "stratified_sample_lang", "cap_per_group", "deterministic_shuffle",
    # events analytics family (r12 rotation)
    "series_anomaly_zscore", "cohort_retention", "funnel_conversion",
    # perceptual image dedup (r9-landed wide variants)
    "image_dhash128", "image_dhash128_neardup",
    # text normalization (r11 rotation)
    "strip_boilerplate",
    # codec tail (r11 rotation — GIF LZW, AVI-MJPEG, frame sampling,
    # PNG resize round-trip)
    "multimodal_decode_gif", "multimodal_decode_avi",
    "multimodal_frame_sample", "multimodal_resize_png",
    # r13 rotation: the four r12-restructured gates (VERDICT r12 #1)
    "split_leakage", "corpus_mix_budget", "dsir_select",
    "dedup_ngram_jaccard_capped",
    # r13 rotation: the last six never-driver-seen gates (r9-#4 plan)
    "quality_filter_stratified", "bpe_pair_counts",
    "neardup_keep_longest", "corpus_curation", "distinct_sketch_hll",
    "multimodal_decode_stub",
    # r13 rotation: the LM family's strictest gate (r12-modified spine)
    "lm_score_kneser_ney",
    # composite end-to-end (v5 runs every v4 stage — decontaminate,
    # then classifier, then the full v3 chain which runs every v2
    # stage; v2/v3/v4 stay verified by the local three-SF sweep)
    "corpus_curation_v5",
]
# (exactly 50 names once every planned gate exists — decode_stub and the
# remaining analytics keep definition order after the window)


def _reorder_registry() -> None:
    by = {d.name: d for d in REGISTRY}
    unknown = [n for n in _DRIVER_WINDOW if n not in by]
    if unknown:
        raise RuntimeError(
            "_DRIVER_WINDOW names gates that are not registered "
            f"(certified set would silently shrink): {unknown}"
        )
    window = [by[n] for n in _DRIVER_WINDOW]
    chosen = {d.name for d in window}
    REGISTRY[:] = window + [d for d in REGISTRY if d.name not in chosen]


_reorder_registry()
