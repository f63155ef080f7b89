"""Per-series (group-by-key) iteration — the reference's O19.

The reference exposes an iterator of per-key sub-iterators
(bykey.rs:18-311, ``get_range_keys``/``get_filter_keys``) as its "map
over each series" primitive, Rayon-parallelizable. The Spark-native
equivalent is grouped-map ``applyInPandas``: one pandas frame per key,
executed in parallel across the cluster with a single shuffle on the
key; records arrive ts-sorted within each frame.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def apply_per_series(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
    *,
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """Run ``fn`` once per series (key group), ts-sorted, in parallel.

    ``fn``: pandas DataFrame (one whole series) -> pandas DataFrame.
    One shuffle on ``key_col``; each group is processed by exactly one
    task (the reference's a-key-is-never-split guarantee,
    database_reader.rs:286-287). Defined inline so cloudpickle ships the
    user fn by value to the Python workers.

    The explicit hash repartition on the key pins the grouped-map
    parallelism: it satisfies the operator's clustering requirement (so
    no second shuffle is added), while without it AQE coalesces the
    shuffle by *bytes* — on a many-small-series table that packs
    thousands of per-group Python calls onto a couple of workers. The
    cost model for grouped-map is group-call count, not shuffle size
    (measured 10x on 7.5k series).
    """

    def sorted_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values(ts_col, kind="mergesort"))

    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key_col).groupBy(key_col).applyInPandas(sorted_fn, schema)


def series_summary(df: DataFrame, *, key_col: str = "key", ts_col: str = "ts") -> DataFrame:
    """Example per-series pass: count + time span + longest gap.

    The longest-gap statistic needs the full sorted series in one place
    — exactly the computation shape O19 exists for (a plain groupBy agg
    cannot see inter-row gaps without a window).
    """

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[ts_col].to_numpy()
        gaps = (ts[1:] - ts[:-1]) if len(ts) > 1 else []
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0]],
                "n": [len(pdf)],
                "span_ns": [int(ts[-1] - ts[0]) if len(ts) else 0],
                "max_gap_ns": [int(max(gaps)) if len(gaps) else 0],
            }
        )

    return apply_per_series(
        df,
        summarize,
        "key string, n long, span_ns long, max_gap_ns long",
        key_col=key_col,
        ts_col=ts_col,
    )
