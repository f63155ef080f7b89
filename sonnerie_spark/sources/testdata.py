"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

``load`` defensively sets two session configs (the driver may hand us a
session without the engine's defaults):

- ``nanosAsLong``: if ``events.ts`` is physical TIMESTAMP(NANOS), Spark
  otherwise refuses the file; as a long it is exactly the engine's
  nanosecond timestamp model.
- UTC session timezone: the driver's regenerated testdata stores
  ``events.ts`` as parquet ``timestamp[us]`` (Spark: TIMESTAMP_NTZ), and
  converting NTZ wall-clock to an epoch instant is timezone-dependent;
  UTC is what makes it equal DuckDB's ``epoch_us(ts)`` bit-for-bit.

``ts_us`` is the one shared normalizer: it turns either physical
encoding of ``ts`` into µs-since-epoch, matching the oracle's
``epoch_us(ts)`` (DuckDB truncates ns->µs; for µs storage it is the
identity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def ts_us(df: DataFrame, col: str = "ts") -> Column:
    """µs-since-epoch Column for ``col``, for either physical encoding
    the driver has generated across rounds:

    - parquet TIMESTAMP(NANOS) read as long ns (``nanosAsLong``):
      integer ``div 1000`` truncation, same as DuckDB ``epoch_us``.
    - parquet ``timestamp[us]`` read as TIMESTAMP_NTZ (or TIMESTAMP):
      ``unix_micros`` after a cast to instant semantics; exact under the
      UTC session timezone ``load`` pins.
    """
    dt = dict(df.dtypes).get(col)
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.expr(f"`{col}` div 1000")
