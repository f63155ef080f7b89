"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

``load`` defensively enables nanosecond-as-long parquet reads on the
given session (the driver may hand us a session without the engine's
defaults): ``events.ts`` is physical TIMESTAMP(NANOS), which Spark
otherwise refuses; as a long it is exactly the engine's nanosecond
timestamp model. The DuckDB oracle sees the same instants via
``epoch_us(ts) == ts_ns // 1000`` (DuckDB truncates ns->us).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
