"""Rebucket crash/concurrency safety (per-run B markers) + commit
hygiene.

The hazard (found in round-4 review): after ``rebucket()`` to a LARGER
B, every old-B bucket file's id is < newB, so an id-only alignment check
would treat old runs as newB-aligned during the window between the
BUCKETS swap and the major compaction (or forever, after a crash in
between) — and bucket pruning would silently drop rows. The fix records
B per run (``B`` marker file, bucketing.py) and declines alignment /
pruning on any mismatch.
"""

import os

import pytest

from sonnerie_spark.bucketing import read_run_buckets
from sonnerie_spark.db import Database

NS = 10**9


def _seed(db, n=40, ts=1000):
    tx = db.create_tx()
    for i in range(n):
        tx.add_record(f"key{i:03d}", ts, "u", [i])
    tx.commit()


def test_runs_record_their_bucket_count(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"), buckets=4)
    _seed(db)
    run = db.data_runs()[0]
    assert read_run_buckets(run.path) == 4
    # Spark-written runs (compaction path) record it too
    db.compact(major=True)
    run = db.data_runs()[0]
    assert run.name == "main"
    assert read_run_buckets(run.path) == 4


def test_rebucket_crash_window_reads_stay_correct(spark, tmp_path):
    """Simulate a crash between the BUCKETS swap and the compaction:
    old-B runs + new-B setting. Scans, point reads and batch point
    reads must all still see every row (via the safe fallbacks)."""
    db = Database(spark, str(tmp_path / "db"), buckets=4)
    _seed(db, ts=1000)
    _seed(db, ts=2000)  # second run so the multi-run path engages
    expect = {(r.key, r.ts, r.v_long[0]) for r in db.read().collect()}
    assert len(expect) == 80

    db._set_buckets(8)  # rebucket step 1 only — "crash" before compact

    # fresh handle (adopts B=8 from BUCKETS)
    db2 = Database(spark, db.path)
    assert db2.buckets == 8
    # old runs must NOT be treated as 8-aligned
    assert db2._bucketed_files(db2.data_runs()) is None
    assert {(r.key, r.ts, r.v_long[0]) for r in db2.read().collect()} == expect
    # point reads prune with each run's RECORDED B (4), not the handle's 8
    assert [r["v_long"][0] for r in db2.get("key007")] == [7, 7]
    got = db2.get_many(["key003", "key019", "nope"])
    assert [r["v_long"][0] for r in got["key003"]] == [3, 3]
    assert [r["v_long"][0] for r in got["key019"]] == [19, 19]
    assert got["nope"] == []

    # convergence: the deferred compaction aligns everything to B=8
    db2.compact(major=True)
    runs = db2.data_runs()
    assert [r.name for r in runs] == ["main"]
    assert read_run_buckets(runs[0].path) == 8
    assert {(r.key, r.ts, r.v_long[0]) for r in db2.read().collect()} == expect


def test_stale_handle_after_full_rebucket(spark, tmp_path):
    """A process still holding the OLD B keeps reading correctly after
    another handle completes a full rebucket (swap + compaction)."""
    stale = Database(spark, str(tmp_path / "db"), buckets=4)
    _seed(stale, ts=1000)
    fresh = Database(spark, stale.path)
    fresh.rebucket(16)
    assert fresh.buckets == 16

    # stale handle: buckets attr is 4, but the on-disk run records 16
    assert stale.buckets == 4
    rows = stale.read().collect()
    assert {r.v_long[0] for r in rows} == set(range(40))
    assert [r["v_long"][0] for r in stale.get("key011")] == [11]
    got = stale.get_many(["key000", "key039"])
    assert [r["v_long"][0] for r in got["key000"]] == [0]
    assert [r["v_long"][0] for r in got["key039"]] == [39]

    # and mixed old-handle writes stay readable everywhere: the stale
    # handle commits a run recorded at B=4 next to the B=16 main
    tx = stale.create_tx()
    tx.add_record("key011", 2000, "u", [111])
    tx.commit()
    for h in (stale, fresh, Database(spark, stale.path)):
        assert [r["v_long"][0] for r in h.get("key011")] == [11, 111]
        assert h.read(key="key011").count() == 2


def test_commit_names_strictly_increase_past_existing(spark, tmp_path):
    """Published tx names are monotonic even if the clock (or a
    preempted writer's pre-generated name) lags behind an already
    published name: the rename floor is the max existing tx name."""
    db = Database(spark, str(tmp_path / "db"), buckets=2)
    # adversarial pre-existing run name far in the future
    future = "tx.7fffffffffffffff"
    os.makedirs(os.path.join(db.path, future))
    tx = db.create_tx()
    tx.add_record("k", 1, "u", [1])
    name = tx.commit()
    assert name > future
    # and the next one lands after that again
    tx = db.create_tx()
    tx.add_record("k", 2, "u", [2])
    assert tx.commit() > name


def test_view_catalog_does_not_grow(spark, tmp_path):
    """Churning run sets must not accumulate dead snk_v_* catalog
    entries: the view GC drops tables along with their directories."""
    import hashlib

    db = Database(spark, str(tmp_path / "db"), buckets=2)
    db._VIEW_TTL_SECONDS = 0.0  # reap aggressively for the test
    phash = hashlib.sha1(db.path.encode()).hexdigest()[:8]

    def my_tables():
        return [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith(f"snk_v_{phash}_")
        ]

    for i in range(4):
        _seed(db, n=5, ts=1000 + i)  # each commit changes the run set
        db.read().count()  # multi-run read builds a bucketed view
        assert len(my_tables()) <= 1, my_tables()


def test_dropped_view_table_recreated_for_cached_handle(spark, tmp_path):
    """A second Database handle's view GC may DROP a snk_v_* table the
    first handle still holds in its _view_tables name cache; the first
    handle's next read must revalidate against the catalog and recreate
    the table instead of failing on the dropped name."""
    db = Database(spark, str(tmp_path / "db"), buckets=2)
    _seed(db, n=5, ts=1000)
    _seed(db, n=5, ts=2000)  # two runs -> bucketed view + catalog table
    first = db.read().count()
    assert db._view_tables  # the name cache is primed

    other = Database(spark, db.path)
    other._VIEW_TTL_SECONDS = 0.0
    # GC from the other handle with nothing kept: drops db's table
    other._gc_stale_views(keep=None)

    assert db.read().count() == first  # cache revalidates, no crash


def test_concurrent_handles_view_churn(spark, tmp_path):
    """Two Database handles on one Spark session, concurrently
    committing, reading (bucketed views), and TTL-GC-ing with a SHORT
    REAL TTL: every read must see full data (a reaped view dir would
    silently list zero files — the bug this pins), and after the churn
    the catalog must shrink back to the live views. The design contract
    is "a view lives at least TTL past its last use" (reads touch the
    dir mtime; the current run-set's view is never reaped), so TTL=0
    is outside the contract — 2 s is inside it with huge margin for the
    ms-scale plan->execute gap."""
    import hashlib
    import threading
    import time as _time

    db1 = Database(spark, str(tmp_path / "db"), buckets=2)
    _seed(db1, n=5, ts=1000)
    _seed(db1, n=5, ts=2000)
    db2 = Database(spark, db1.path)
    db1._VIEW_TTL_SECONDS = 2.0
    db2._VIEW_TTL_SECONDS = 2.0
    errs = []

    def churn(db, base):
        try:
            for i in range(6):
                _seed(db, n=3, ts=base + i)
                n = db.read().count()
                assert n > 0, "read raced a view reap to zero rows"
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=churn, args=(db1, 10_000))
    t2 = threading.Thread(target=churn, args=(db2, 20_000))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    # age every view past the TTL, then one more read + GC cycle
    _time.sleep(2.2)
    assert db1.read().count() > 0
    phash = hashlib.sha1(db1.path.encode()).hexdigest()[:8]
    alive = [t.name for t in spark.catalog.listTables()
             if t.name.startswith(f"snk_v_{phash}_")]
    assert len(alive) <= 2, alive  # current view (+ the one just touched)


def test_concurrent_sessions_view_churn(spark, tmp_path):
    """Two Database handles on two SEPARATE SparkSessions (newSession:
    isolated SQL conf/temp views, SHARED external catalog — where
    snk_v_* tables live): churning run sets from both sessions must not
    accumulate dead catalog tables (growth bound), one session's TTL GC
    must not break the other's reads (the catalog-revalidation path,
    cross-session this time), and both sessions must read full data
    throughout."""
    import hashlib

    s1 = spark.newSession()
    s2 = spark.newSession()
    db1 = Database(s1, str(tmp_path / "db"), buckets=2)
    _seed(db1, n=5, ts=1000)
    _seed(db1, n=5, ts=2000)  # two runs -> bucketed view + catalog table
    db2 = Database(s2, db1.path)
    db1._VIEW_TTL_SECONDS = 0.0  # reap aggressively from session 1
    phash = hashlib.sha1(db1.path.encode()).hexdigest()[:8]

    def my_tables(s):
        return [
            t.name
            for t in s.catalog.listTables()
            if t.name.startswith(f"snk_v_{phash}_")
        ]

    n = db2.read().count()
    assert n > 0
    for i in range(4):
        _seed(db1, n=3, ts=3000 + i)  # churn the run set from session 1
        assert db1.read().count() > n  # read + TTL-GC from session 1
        # session 2's cached table name may have been dropped by session
        # 1's GC — its read must revalidate against the shared catalog
        assert db2.read().count() > n
        n = db2.read().count()
        # the shared catalog stays bounded: both sessions see the same
        # table namespace, and dead sigs are dropped as views churn
        assert len(my_tables(s1)) <= 2, my_tables(s1)
        assert len(my_tables(s2)) <= 2, my_tables(s2)
