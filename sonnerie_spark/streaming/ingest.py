"""Structured Streaming ingest: micro-batch == transaction.

The reference's near-real-time path is ``sonnerie-serve``: each HTTP PUT
external-sorts its (possibly unsorted) lines and commits ONE transaction;
readers see data only after commit (sonnerie-serve.rs:98-204;
README.md:31-35 isolation). The Spark-native equivalent is a streaming
source feeding ``foreachBatch``:

- each micro-batch is parsed, validated, and committed as one run via
  ``Database.commit_dataframe`` — the shuffle-sort inside the commit IS
  the external sort (shardio in the reference);
- commit is atomic (tempdir + rename), so a concurrent batch reader
  never sees a half-written run — identical isolation semantics;
- exactly-once: the checkpoint tracks consumed offsets, and a replayed
  batch overwrites nothing (each commit is a NEW run; LWW dedup makes
  replays idempotent when (key, ts) collide).

Watermarks / windowed aggregation over the record stream are standard
Structured Streaming on top of the same parsed stream (see
``windowed_counts``) — the reference has no stateful streaming operators
(SURVEY §2.2 'Streaming'), so these are north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sonnerie_spark.db import RECORD_SCHEMA, Database


def parse_lines(lines: DataFrame, *, default_fmt: str | None = None, value_col: str = "value") -> DataFrame:
    """Parse text-protocol lines into record rows, distributed.

    Arrow-batched ``mapInPandas``: lines travel executor→Python and
    records Python→executor as columnar Arrow batches, and the parse
    stays inside the single write stage (no RDD round-trip / separate
    job as a ``createDataFrame(rdd)`` plan would cost). The per-line
    work is the pure-Python protocol parser — ingest is parse-bound in
    the reference too (formatted.rs:20-106). Malformed lines raise,
    matching the reference's hard parse errors.
    """
    fmt = default_fmt
    col = value_col

    def decode(batches):
        # self-contained closure: imports inside so cloudpickle ships it
        import pandas as pd

        from sonnerie_spark import rowformat

        for pdf in batches:
            out = [
                rowformat.parse_line(line, default_fmt=fmt).as_row()
                for line in pdf[col]
                if line and line.strip()
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in RECORD_SCHEMA.fields]
            )

    return lines.mapInPandas(decode, RECORD_SCHEMA)


def stream_text_ingest(
    spark: SparkSession,
    db: Database,
    input_dir: str,
    *,
    checkpoint_dir: str,
    default_fmt: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """File-source streaming ingest: every discovered file's lines join
    the next micro-batch; each micro-batch commits one transaction.

    Returns the StreamingQuery (caller manages lifecycle/termination).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.load(input_dir)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # batch_df is a static DataFrame: reuse the batch parse + the
        # transactional commit path (sorted run, atomic rename).
        # Emptiness is probed on the RAW lines, not the parsed frame —
        # probing rows would execute the Arrow parse once for the probe
        # and again inside the commit's shuffle-sort, doubling the
        # parse-bound cost of every micro-batch. A batch of only blank
        # lines now commits an empty run, a supported case everywhere
        # (rollup refresh, schema-explicit readers).
        if not batch_df.isEmpty():
            db.commit_dataframe(
                parse_lines(batch_df, default_fmt=default_fmt),
                check_duplicates=False,
            )

    return (
        lines.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_dedup_exact(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    content_col: str = "text",
    time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop documents whose content digest was
    already seen, ACROSS micro-batches.

    The streaming face of ``operators.dedup.exact_dedup`` — a corpus
    arriving continuously (crawl output, log shippers) deduped before it
    ever lands. State is one digest per distinct content, partitioned by
    digest in the state store.

    Two modes, chosen by ``time_col``:

    - ``None``: ``dropDuplicates`` on the digest — state grows with
      distinct contents forever (fine for bounded corpora / sessions).
    - an event-time column: ``dropDuplicatesWithinWatermark`` — a
      duplicate arriving within the watermark of its first copy is
      dropped, and state older than the watermark is evicted. This is
      the 100 TB mode: state is bounded by the dedup horizon, not by
      corpus history (crawl re-fetch storms are bursty; a horizon of
      hours catches them without remembering the whole crawl).

    On a batch DataFrame the digest-only mode runs unchanged;
    ``dropDuplicatesWithinWatermark`` is streaming-only in Spark, so
    with ``time_col`` set a batch input falls back to plain
    ``dropDuplicates`` (a static frame IS one complete batch — every
    duplicate is within any horizon of its first copy).
    """
    with_digest = docs.withColumn("_digest", F.md5(F.col(content_col)))
    if time_col is None or not docs.isStreaming:
        return with_digest.dropDuplicates(["_digest"]).drop("_digest")
    return (
        with_digest.withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )


def stateful_running_stats(
    records: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator: per-key cumulative count/sum
    maintained ACROSS micro-batches with ``applyInPandasWithState``.

    The reference has no stateful streaming at all (SURVEY §2.2
    Streaming) — its 'state' is the LSM itself, recomputed at read. This
    is the Spark-native alternative: state lives in the state store
    (checkpointed, partitioned by key, sized by #distinct keys not by
    history length), and each micro-batch emits the updated running
    totals for the keys it touched. Arrow-batched per group; pick
    ``update`` output mode so the sink sees one row per touched key per
    batch.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    # key CAST TO STRING before grouping (HllStore's grp rule): the
    # output schema below declares `key string`, and a bigint key
    # column would otherwise crash every micro-batch at the Arrow
    # serializer instead of anywhere visible at plan time (the cast is
    # a projection, not a groupBy expression — applyInPandasWithState
    # rejects derived grouping expressions)
    records = records.withColumn(key_col, F.col(key_col).cast("string"))
    return records.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _ts_utc(col_name: str) -> "F.Column":
    """ns -> µs timestamp via INTEGER division. `(ts / 1000)
    .cast('long')` routes through double: above 2^53 ns (~1984) the
    rounding error reaches ±128 ns, enough to flip a record across a
    window/session boundary. `div` stays integer-exact at any epoch;
    negative (pre-1970) sub-µs remainders truncate toward zero, the
    same direction the old double path truncated.
    """
    return F.timestamp_micros(F.expr(f"{col_name} div 1000"))


def session_windows(
    records: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key session windows: a session extends while successive
    records arrive within ``gap`` of each other and closes after a quiet
    period (``F.session_window`` — dynamic-length windows, unlike the
    fixed tumbling windows of :func:`windowed_counts`).

    State is one open session per key, merged as late rows arrive and
    finalized by the watermark; works identically on a batch DataFrame
    (the batch form is the ``sessionize`` operator in
    operators/timeseries.py, which uses a lag/cumsum window instead —
    two expressions of the same semantics, streaming-safe vs
    batch-optimal).
    """
    with_time = records.withColumn("ts_utc", _ts_utc("ts"))
    return (
        with_time.withWatermark("ts_utc", watermark)
        .groupBy(F.session_window("ts_utc", gap).alias("win"), F.col("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "key",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n",
        )
    )


def windowed_counts(
    records: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming tumbling-window per-key rollup with late-data handling.

    ``records`` is a (possibly streaming) DataFrame with ``key`` and
    nanosecond ``ts``; the watermark bounds state for late arrivals —
    the north-star replacement for 'late data is just a new transaction'
    (SURVEY §2.2 Streaming).
    """
    with_time = records.withColumn("ts_utc", _ts_utc("ts"))
    return (
        with_time.withWatermark("ts_utc", watermark)
        .groupBy(F.window("ts_utc", window).alias("win"), F.col("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("key", F.col("win.start").alias("window_start"), "n")
    )
