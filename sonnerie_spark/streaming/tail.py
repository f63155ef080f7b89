"""Tail a Database as a Structured Streaming source.

The reference has no change-feed: readers poll via the 10-second reader
cache (sonnerie-serve.rs) and see whole new transactions after commit.
The Spark-native generalization is a file-source stream over the run
directories — commits are atomic directory renames, so a newly visible
``tx.*/part-*.parquet`` file is always a complete, sorted run, and the
file source's exactly-once file tracking turns the LSM's commit log into
a record stream with no extra bookkeeping.

Semantics (documented, not accidental):

- **At-least-once records, exactly-once runs.** Each committed run's
  records are emitted exactly once *per file*. LWW overwrites of an
  earlier (key, ts) appear as new records (a CDC upsert stream, not a
  snapshot); downstream state that applies last-writer-wins converges to
  ``Database.read()``.
- **Delete markers are not emitted** (their parquet schema is a marker
  predicate, not records; ``pathGlobFilter`` skips the ``deletes.parquet``
  file). A downstream view that must honor deletes should consume
  ``delete_markers()`` out-of-band — same division the reference makes
  (markers live beside runs, applied at read).
- **Compaction re-emits.** Minor compaction merges tx runs into a new tx
  directory that the stream will pick up. Either pause compaction while
  tailing, or rely on LWW idempotence downstream (replayed records carry
  identical (key, ts, values)). This is the standard at-least-once
  contract of file-based CDC.

Scale: the file source lists the directory per micro-batch — O(runs),
the same cost the reference's reader cache pays; maxFilesPerTrigger
bounds batch size for backfill over a large existing DB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sonnerie_spark.db import RECORD_SCHEMA, Database


def tail_records(
    db: Database,
    *,
    include_existing: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of record rows from committed runs (tx.* and
    main), in RECORD_SCHEMA. Start with ``.writeStream`` as usual.

    ``include_existing=False`` starts from the current end of the DB:
    the runs present at stream-definition time are excluded by an
    ``input_file_name`` predicate (the file stream source forbids
    ``modifiedAfter``). The filter is evaluated before any decode cost
    matters — the excluded runs are still *listed* per batch (O(runs),
    the cost the reference's reader cache also pays), so snapshot the DB
    with a major compaction first if the backlog is huge.
    """
    reader = (
        db.spark.readStream.schema(RECORD_SCHEMA)
        # data files only: skips delete-marker parquet (deletes.parquet)
        # and sentinel/_SUCCESS files
        .option("pathGlobFilter", "part-*.parquet")
        .option("recursiveFileLookup", "true")
        # Compaction hides replaced runs with an atomic rename, so a file
        # listed for a micro-batch can vanish before the batch reads it;
        # without this the stream DIES mid-compaction (caught by the
        # combined soak, tools/soak_streaming.py). Skipping is safe HERE
        # because runs only ever disappear via compaction, whose merged
        # output lands as new files the next listing picks up — the
        # skipped records re-arrive, preserving at-least-once. (Delete
        # markers never emit records in the first place.)
        .option("ignoreMissingFiles", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(db.path)
    if not include_existing:
        import re

        from pyspark.sql import functions as F

        # Match on RUN NAMES, not full paths: input_file_name() returns
        # the percent-ENCODED URI, so a db.path with a space or
        # non-ASCII char would never match its raw re.escape'd form and
        # the filter would silently exclude nothing (replaying all of
        # history). Run names use only [A-Za-z0-9._-] — identical in
        # raw and URI form — and the `/<name>/part-*.parquet$` anchor
        # pins the match to the run-directory component, so a db.path
        # component that happens to equal a run name cannot match.
        existing = [run.name for run in db.data_runs()]
        if existing:
            pattern = (
                "/("
                + "|".join(re.escape(n) for n in existing)
                + r")/part-[^/]*\.parquet$"
            )
            df = df.filter(~F.input_file_name().rlike(pattern))
    return df
