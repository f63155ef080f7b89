"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the registry in
:mod:`sonnerie_spark.benchqueries` — one entry per implemented operator
from SURVEY.md §2 plus the training-data pipeline operators. The driver
runs each Spark query and its DuckDB oracle side-by-side at sf=0.01 and
hash-compares results (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from sonnerie_spark.benchqueries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 5-way star join with
    broadcast dims + decimal-exact revenue rollup."""
    from sonnerie_spark.benchqueries import q_region_revenue

    return q_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {d.name: d.spark for d in REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {d.name: d.oracle for d in REGISTRY if d.oracle is not None}
