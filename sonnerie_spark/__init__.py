"""sonnerie_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of njaard/sonnerie, re-expressed Spark-first.

The reference (studied at /root/reference) is an embedded LSM-flavored
time-series database: UTF-8 string key -> chronologically sorted
(timestamp-nanos, value-tuple) records in immutable sorted runs, with
last-writer-wins merge across runs, delete markers, compaction, and
key/time/column-filtered sorted scans.

This package maps that model onto Spark:

- storage: a database is a directory of Parquet "runs" (one per committed
  transaction) plus a small deletes table; Parquet row-group min/max stats
  replace the reference's hand-rolled sparse segment index.
- read path: ``Database.read()`` returns a DataFrame = union of runs with
  ``_txid`` -> last-writer-wins dedup -> delete anti-filter -> key/time
  filters, all declarative so Catalyst prunes files/row-groups and pushes
  predicates into the scan.
- write path: ``Transaction`` sorts/partitions by key and commits
  atomically via tmp-dir + rename (mirrors the reference's tempfile +
  atomic-rename commit, create_tx.rs:180-264).
- analytics: operators the reference delegates to external tools
  (aggregation, joins, windows, resampling, as-of joins) plus the
  large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) live in :mod:`sonnerie_spark.operators`.
"""

from sonnerie_spark.session import get_spark
from sonnerie_spark.db import Database, Transaction
from sonnerie_spark.streaming.rollup import ContinuousRollup

__all__ = ["get_spark", "Database", "Transaction", "ContinuousRollup"]
__version__ = "0.1.0"
