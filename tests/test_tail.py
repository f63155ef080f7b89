"""Streaming tail source: committed runs become a record stream."""

import time

import pytest

from sonnerie_spark.db import Database
from sonnerie_spark.streaming.tail import tail_records

T0 = 1577836800 * 10**9


@pytest.fixture()
def db(spark, tmp_path):
    return Database(spark, str(tmp_path / "db"))


def _commit(db, key, n, base=0):
    tx = db.create_tx()
    for i in range(n):
        tx.add_record(key, T0 + (base + i) * 10**9, "u", [base + i])
    tx.commit()


def test_tail_emits_runs_as_they_commit(db, spark, tmp_path):
    _commit(db, "alpha", 5)
    q = (
        tail_records(db)
        .writeStream.format("memory")
        .queryName("tail_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select count(*) from tail_sink").first()[0] == 5

        # a new commit (and a delete marker, which must NOT be emitted)
        _commit(db, "beta", 3, base=100)
        db.commit_deletes([{"wildcard": "alpha", "before_ns": T0 + 2 * 10**9}])
        q.processAllAvailable()
        total = spark.sql("select count(*) from tail_sink").first()[0]
        keys = {
            r[0] for r in spark.sql("select distinct key from tail_sink").collect()
        }
        assert total == 8  # 5 alpha + 3 beta; no delete-marker rows
        assert keys == {"alpha", "beta"}
    finally:
        q.stop()


def test_tail_skip_existing(db, spark, tmp_path):
    _commit(db, "old", 4)
    time.sleep(1.1)  # modifiedAfter has second-level granularity headroom
    stream = tail_records(db, include_existing=False)
    _commit(db, "new", 2, base=50)
    q = (
        stream.writeStream.format("memory")
        .queryName("tail_skip_sink")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
        keys = {
            r[0]
            for r in spark.sql("select distinct key from tail_skip_sink").collect()
        }
        assert keys == {"new"}, keys
    finally:
        q.stop()


def test_tail_skip_existing_under_uri_escaped_path(spark, tmp_path):
    """include_existing=False must hold when the database path needs
    URI escaping: input_file_name() returns the percent-ENCODED URI
    (file:///data/my%20db/...), so an exclusion built from the raw
    path would match NOTHING and silently replay all of history. The
    filter matches run-directory NAMES (URI-safe charset) instead."""
    spaced = tmp_path / "my db"  # space -> %20 in the file URI
    spaced.mkdir()
    db2 = Database(spark, str(spaced / "store"))
    _commit(db2, "old", 4)
    time.sleep(1.1)
    stream = tail_records(db2, include_existing=False)
    _commit(db2, "new", 2, base=50)
    q = (
        stream.writeStream.format("memory")
        .queryName("tail_uri_sink")
        .option("checkpointLocation", str(tmp_path / "ck_uri"))
        .start()
    )
    try:
        q.processAllAvailable()
        keys = {
            r[0]
            for r in spark.sql(
                "select distinct key from tail_uri_sink"
            ).collect()
        }
        assert keys == {"new"}, keys  # history NOT replayed
    finally:
        q.stop()


def test_tail_replication_converges(db, spark, tmp_path):
    """Replication via the change feed: tail db A and commit each
    micro-batch into db B. After the stream drains, B's merged read
    equals A's — the LSM-over-streaming replication loop, built purely
    from public pieces (tail_records + foreachBatch + commit_dataframe)."""
    from sonnerie_spark.db import Database

    _commit(db, "alpha", 5)
    _commit(db, "beta", 3, base=100)

    dst = Database(spark, str(tmp_path / "replica"))

    def replicate(batch_df, batch_id):
        if batch_df.take(1):
            dst.commit_dataframe(batch_df, check_duplicates=False)

    q = (
        tail_records(db)
        .writeStream.foreachBatch(replicate)
        .option("checkpointLocation", str(tmp_path / "ck_repl"))
        .start()
    )
    try:
        q.processAllAvailable()
        src = {(r.key, r.ts): r.v_long for r in db.read().collect()}
        got = {(r.key, r.ts): r.v_long for r in dst.read().collect()}
        assert got == src and len(got) == 8

        # incremental: a later commit (an LWW overwrite) flows through
        tx = db.create_tx()
        tx.add_record("alpha", T0, "u", [999])
        tx.commit()
        q.processAllAvailable()
        assert {r.v_long[0] for r in dst.read(key="alpha").collect() if r.ts == T0} == {999}
    finally:
        q.stop()


def test_tail_drives_rollup_refresh(db, spark, tmp_path):
    """End-to-end continuous aggregate: tail_records -> foreachBatch ->
    ContinuousRollup.refresh(). The rollup must converge to the batch
    ground truth under live commits, including an LWW overwrite."""
    from pyspark.sql import functions as F

    from sonnerie_spark.streaming.rollup import ContinuousRollup

    HOUR = 3600 * 10**9

    def expected():
        r = db.read().select(
            "key",
            (F.col("ts") - F.pmod("ts", F.lit(HOUR))).alias("bucket_ts"),
            F.element_at("v_long", 1).cast("double").alias("v"),
        )
        return {
            (x["key"], x["bucket_ts"]): (x["n"], x["sum"])
            for x in r.groupBy("key", "bucket_ts")
            .agg(F.count("v").alias("n"), F.sum("v").alias("sum"))
            .collect()
        }

    roll = ContinuousRollup(db, str(tmp_path / "roll"), interval_ns=HOUR)
    _commit(db, "alpha", 4)
    q = roll.stream(str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        got = {
            (x["key"], x["bucket_ts"]): (x["n"], x["sum"])
            for x in roll.read().collect()
        }
        assert got == expected() and got

        # live commits: a new key and an LWW overwrite of alpha's t=0
        _commit(db, "beta", 3, base=7200)
        tx = db.create_tx()
        tx.add_record("alpha", T0, "u", [999])
        tx.commit()
        q.processAllAvailable()
        got = {
            (x["key"], x["bucket_ts"]): (x["n"], x["sum"])
            for x in roll.read().collect()
        }
        assert got == expected()
        # the overwrite really landed (sum includes 999, count unchanged)
        alpha_bucket = (T0 - T0 % HOUR)
        assert got[("alpha", alpha_bucket)][1] >= 999.0
    finally:
        q.stop()


def test_combined_streaming_soak(spark, tmp_path):
    """Short version of tools/soak_streaming.py: BOTH streaming
    consumers (rollup refresh + incremental LSH index) against one live
    source with minor compaction interleaved — the cross-feature races
    (tail listing vs compaction swap, refresh cursor vs merged-run
    replay) no single-path test hits. The 50-commit version with major
    compaction + index compaction runs as a tool (see SCALE.md)."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "soak_streaming",
        os.path.join(os.path.dirname(__file__), "..", "tools", "soak_streaming.py"),
    )
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)
    stats = soak.run_soak(spark, str(tmp_path), 10)
    assert stats["rollup_batches"] >= 10 and stats["lsh_batches"] >= 10
    assert stats["pairs"] > 0
