"""ContinuousRollup: incremental correctness vs full recompute, LWW
overwrite safety, compaction idempotence, cursor behavior."""

import pytest
from pyspark.sql import functions as F

from sonnerie_spark.db import Database
from sonnerie_spark.streaming.rollup import ContinuousRollup

HOUR = 3600 * 10**9
T0 = 1577836800 * 10**9  # 2020-01-01


@pytest.fixture()
def src(spark, tmp_path):
    return Database(spark, str(tmp_path / "src"))


def _rollup(src, tmp_path):
    return ContinuousRollup(src, str(tmp_path / "roll"), interval_ns=HOUR)


def _expected(src):
    """Ground truth: full recompute from the merged view."""
    r = src.read().select(
        "key",
        (F.col("ts") - F.pmod("ts", F.lit(HOUR))).alias("bucket_ts"),
        F.element_at("v_long", 1).cast("double").alias("v"),
    )
    return {
        (x["key"], x["bucket_ts"]): (x["n"], x["sum"], x["min"], x["max"])
        for x in r.groupBy("key", "bucket_ts")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("sum"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
        )
        .collect()
    }


def _got(roll):
    return {
        (x["key"], x["bucket_ts"]): (x["n"], x["sum"], x["min"], x["max"])
        for x in roll.read().collect()
    }


def test_initial_build_and_incremental(src, tmp_path):
    tx = src.create_tx()
    for i in range(6):  # 2 keys x 3 records over 2 hour-buckets
        tx.add_record("a", T0 + i * 1800 * 10**9, "u", [i])
        tx.add_record("b", T0 + i * 1800 * 10**9, "u", [10 * i])
    tx.commit()

    roll = _rollup(src, tmp_path)
    assert roll.refresh() is not None
    assert _got(roll) == _expected(src)

    # no new data -> no new tx
    assert roll.refresh() is None

    # incremental: a new tx touching ONE bucket of key a
    tx = src.create_tx()
    tx.add_record("a", T0 + 10 * 60 * 10**9, "u", [100])
    tx.commit()
    assert roll.refresh() is not None
    assert _got(roll) == _expected(src)
    # the incremental tx only carries the dirty bucket, not the world
    last_run = src.spark.read.parquet(roll.dst.data_runs()[-1].path)
    assert last_run.count() == 1


def test_lww_overwrite_does_not_double_count(src, tmp_path):
    tx = src.create_tx()
    tx.add_record("k", T0, "u", [5])
    tx.commit()
    roll = _rollup(src, tmp_path)
    roll.refresh()
    assert _got(roll)[("k", T0)] == (1, 5.0, 5.0, 5.0)

    # overwrite the SAME (key, ts): count must stay 1
    tx = src.create_tx()
    tx.add_record("k", T0, "u", [7])
    tx.commit()
    roll.refresh()
    assert _got(roll)[("k", T0)] == (1, 7.0, 7.0, 7.0)


def test_minor_compaction_replay_is_idempotent(src, tmp_path):
    for i in range(3):
        tx = src.create_tx()
        tx.add_record("k", T0 + i * 10**9, "u", [i])
        tx.commit()
    roll = _rollup(src, tmp_path)
    roll.refresh()
    before = _got(roll)
    src.compact()  # minor: merges tx runs into a new tx.* run
    roll.refresh()  # replays the compacted run; recompute is idempotent
    assert _got(roll) == before == _expected(src)


def test_refresh_full_after_source_delete(src, tmp_path):
    tx = src.create_tx()
    tx.add_record("gone", T0, "u", [1])
    tx.add_record("kept", T0, "u", [2])
    tx.commit()
    roll = _rollup(src, tmp_path)
    roll.refresh()
    assert ("gone", T0) in _got(roll)

    src.commit_deletes([{"wildcard": "gone"}])
    # incremental path cannot see marker-only commits (documented);
    # full refresh clears the stale bucket
    roll.refresh_full()
    got = _got(roll)
    assert ("gone", T0) not in got
    assert got[("kept", T0)] == (1, 2.0, 2.0, 2.0)


def test_interval_mismatch_rejected(src, tmp_path):
    tx = src.create_tx()
    tx.add_record("k", T0, "u", [1])
    tx.commit()
    _rollup(src, tmp_path).refresh()
    with pytest.raises(ValueError, match="interval_ns"):
        ContinuousRollup(src, str(tmp_path / "roll"), interval_ns=2 * HOUR).refresh()


def test_cascade_hourly_to_daily(src, tmp_path):
    DAY = 24 * HOUR
    tx = src.create_tx()
    for h in range(30):  # 30 hourly records spanning 2 days
        tx.add_record("k", T0 + h * HOUR + 60 * 10**9, "u", [h])
    tx.commit()
    hourly = _rollup(src, tmp_path)
    hourly.refresh()
    daily = ContinuousRollup.cascade(
        hourly, str(tmp_path / "daily"), interval_ns=DAY
    )
    daily.refresh()

    got = {
        (r["key"], r["bucket_ts"]): (r["n"], r["sum"], r["min"], r["max"])
        for r in daily.read().collect()
    }
    assert got == {
        ("k", T0): (24, float(sum(range(24))), 0.0, 23.0),
        ("k", T0 + DAY): (6, float(sum(range(24, 30))), 24.0, 29.0),
    }

    # incremental ripple: new raw tx -> refresh hourly -> refresh daily
    tx = src.create_tx()
    tx.add_record("k", T0 + 30 * 60 * 10**9, "u", [1000])  # into day 1
    tx.commit()
    hourly.refresh()
    daily.refresh()
    got = {
        (r["key"], r["bucket_ts"]): (r["n"], r["sum"], r["max"])
        for r in daily.read().collect()
    }
    assert got[("k", T0)] == (25, float(sum(range(24)) + 1000), 1000.0)

    # misaligned interval rejected
    with pytest.raises(ValueError, match="multiple"):
        ContinuousRollup.cascade(hourly, str(tmp_path / "bad"), interval_ns=90 * 60 * 10**9)


def test_corrupt_cursor_self_heals(src, tmp_path):
    """A corrupt/lost cursor degrades to a full rebuild, not an error:
    the rebuild recommits every bucket and the LWW upsert makes that
    idempotent — read values unchanged."""
    tx = src.create_tx()
    for i in range(4):
        tx.add_record("k", T0 + i * HOUR, "u", [i])
    tx.commit()
    roll = _rollup(src, tmp_path)
    roll.refresh()
    before = _got(roll)

    with open(roll._cursor_path, "w") as f:
        f.write("{not json")
    assert roll.refresh() is not None  # reprocesses everything
    assert _got(roll) == before == _expected(src)


def test_rollup_random_commit_refresh_interleaving(src, tmp_path):
    """Model check: any interleaving of commits (with LWW overwrites)
    and refreshes converges to the brute-force recompute."""
    import random

    rng = random.Random(7)
    roll = _rollup(src, tmp_path)
    for _ in range(6):
        batch = {}
        for _ in range(rng.randint(1, 8)):
            k = f"k{rng.randint(0, 3)}"
            t = T0 + rng.randint(0, 5) * 1800 * 10**9
            batch[(k, t)] = rng.randint(0, 100)
        tx = src.create_tx()
        for (k, t), v in sorted(batch.items()):
            tx.add_record(k, t, "u", [v])
        tx.commit()
        if rng.random() < 0.7:
            roll.refresh()
    roll.refresh()
    assert _got(roll) == _expected(src)


def test_rollup_after_transform_compaction_needs_full(src, tmp_path):
    """Pin the documented contract: a transform-compaction changes
    merged content invisibly to the incremental path (rewritten `main`
    is skipped); refresh_full restores correctness."""
    from pyspark.sql import functions as F

    tx = src.create_tx()
    tx.add_record("k", T0, "u", [5])
    tx.commit()
    roll = _rollup(src, tmp_path)
    roll.refresh()
    assert _got(roll)[("k", T0)] == (1, 5.0, 5.0, 5.0)

    # transform-compaction: triple every value
    src.compact(
        major=True,
        transform=lambda df: df.withColumn(
            "v_long", F.transform("v_long", lambda x: x * 3)
        ),
    )
    assert roll.refresh() is None  # incremental path cannot see it
    assert _got(roll)[("k", T0)] == (1, 5.0, 5.0, 5.0)  # stale, as documented
    roll.refresh_full()
    assert _got(roll)[("k", T0)] == (1, 15.0, 15.0, 15.0)


def test_multicol_rollup_incremental_and_cascade(src, tmp_path):
    """num_values=2: both value columns aggregate independently through
    an incremental refresh (LWW overwrite included) and the per-column
    reaggregation identity holds through a cascade."""
    tx = src.create_tx()
    for i in range(6):
        tx.add_record("a", T0 + i * 1800 * 10**9, "FF", [float(i), float(100 - i)])
        tx.add_record("b", T0 + i * 1800 * 10**9, "FF", [float(10 * i), float(-i)])
    tx.commit()

    roll = ContinuousRollup(
        src, str(tmp_path / "mc"), interval_ns=HOUR, num_values=2
    )
    assert roll.refresh() is not None

    def expected():
        r = src.read().select(
            "key",
            (F.col("ts") - F.pmod("ts", F.lit(HOUR))).alias("bucket_ts"),
            F.element_at("v_double", 1).alias("x1"),
            F.element_at("v_double", 2).alias("x2"),
        )
        return {
            (x["key"], x["bucket_ts"]): (
                x["n1"], x["s1"], x["mn1"], x["mx1"],
                x["n2"], x["s2"], x["mn2"], x["mx2"],
            )
            for x in r.groupBy("key", "bucket_ts")
            .agg(
                F.count("x1").alias("n1"), F.sum("x1").alias("s1"),
                F.min("x1").alias("mn1"), F.max("x1").alias("mx1"),
                F.count("x2").alias("n2"), F.sum("x2").alias("s2"),
                F.min("x2").alias("mn2"), F.max("x2").alias("mx2"),
            )
            .collect()
        }

    def got():
        return {
            (x["key"], x["bucket_ts"]): (
                x["n1"], x["sum1"], x["min1"], x["max1"],
                x["n2"], x["sum2"], x["min2"], x["max2"],
            )
            for x in roll.read().collect()
        }

    assert got() == expected()

    # LWW overwrite of one record via a second tx; incremental refresh
    tx = src.create_tx()
    tx.add_record("a", T0, "FF", [999.0, -999.0])
    tx.commit()
    assert roll.refresh() is not None
    assert got() == expected()

    # cascade inherits num_values; 2-hour buckets merge per column
    coarse = ContinuousRollup.cascade(
        roll, str(tmp_path / "mc2"), interval_ns=2 * HOUR
    )
    assert coarse.num_values == 2
    coarse.refresh()
    direct = {
        (x["key"], x["bucket_ts"]): (
            x["n1"], x["s1"], x["mn1"], x["mx1"],
            x["n2"], x["s2"], x["mn2"], x["mx2"],
        )
        for x in src.read()
        .select(
            "key",
            (F.col("ts") - F.pmod("ts", F.lit(2 * HOUR))).alias("bucket_ts"),
            F.element_at("v_double", 1).alias("x1"),
            F.element_at("v_double", 2).alias("x2"),
        )
        .groupBy("key", "bucket_ts")
        .agg(
            F.count("x1").alias("n1"), F.sum("x1").alias("s1"),
            F.min("x1").alias("mn1"), F.max("x1").alias("mx1"),
            F.count("x2").alias("n2"), F.sum("x2").alias("s2"),
            F.min("x2").alias("mn2"), F.max("x2").alias("mx2"),
        )
        .collect()
    }
    got_coarse = {
        (x["key"], x["bucket_ts"]): (
            x["n1"], x["sum1"], x["min1"], x["max1"],
            x["n2"], x["sum2"], x["min2"], x["max2"],
        )
        for x in coarse.read().collect()
    }
    assert got_coarse == direct and direct

    # num_values mismatch on reopen is rejected (cursor identity)
    with pytest.raises(ValueError, match="num_values"):
        ContinuousRollup(
            src, str(tmp_path / "mc"), interval_ns=HOUR, num_values=3
        ).refresh()

    # records with FEWER columns than num_values: missing slots count 0
    tx = src.create_tx()
    tx.add_record("c", T0, "F", [5.0])
    tx.commit()
    assert roll.refresh() is not None
    c_rows = {r["key"]: r for r in roll.read(key="c").collect()}
    r = c_rows["c"]
    assert (r["n1"], r["sum1"]) == (1, 5.0)
    assert r["n2"] == 0 and r["sum2"] is None


def test_multicol_rollup_rejects_mixed_format(src, tmp_path):
    """num_values>1 over a record mixing long and double values ("iF")
    must FAIL the refresh, not aggregate a plausible-but-wrong column —
    per-typed-array positions cannot recover declaration order."""
    tx = src.create_tx()
    tx.add_record("a", T0, "iF", [3, 2.5])
    tx.add_record("a", T0 + 1800 * 10**9, "iF", [4, 1.5])
    tx.commit()

    roll = ContinuousRollup(
        src, str(tmp_path / "mx"), interval_ns=HOUR, num_values=2
    )
    with pytest.raises(Exception, match="mixed long/double format 'iF'"):
        roll.refresh()

    # num_values=1 stays supported on the same source: coalesce resolves
    # the FIRST numeric value correctly whatever the mix.
    roll1 = ContinuousRollup(
        src, str(tmp_path / "m1"), interval_ns=HOUR, num_values=1
    )
    assert roll1.refresh() is not None


def test_refresh_survives_empty_run(spark, src, tmp_path):
    """A committed-but-EMPTY run (empty commit_dataframe / an
    all-filtering gegnum) holds zero part files; the dirty-set scan
    must read it under the explicit RECORD_SCHEMA and no-op instead of
    crashing schema inference — in stream() that exception would kill
    the rollup query permanently."""
    from sonnerie_spark.db import RECORD_SCHEMA

    tx = src.create_tx()
    tx.add_record("k", T0, "u", [1])
    tx.commit()
    roll = _rollup(src, tmp_path)
    roll.refresh()

    src.commit_dataframe(
        spark.createDataFrame([], RECORD_SCHEMA), check_duplicates=False
    )
    roll.refresh()  # empty new run: must be a clean no-op
    out = {
        (r["key"], r["ts"]): r["v_long"][0]
        for r in roll.dst.read().collect()
    }
    assert out == {("k", T0 - T0 % HOUR): 1}
