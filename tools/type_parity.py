#!/usr/bin/env python3
"""Registry-wide DuckDB-vs-Spark result TYPE parity scan.

The r7 driver-red on ``bm25_topk`` was a pure width flip: DuckDB widens
``sum(BIGINT)`` to HUGEINT (int128) while Spark's ``F.sum`` stays
BIGINT, and a driver hash computed over typed/serialized (Arrow)
results flips on the width even when every value is identical.  The
local value checker canonicalizes to Python ints, so the class was
invisible for two rounds.

This tool closes the class: for every registry gate with an oracle it
binds the DuckDB relation (no execution — ``.types`` is available after
binding) and builds the Spark DataFrame (lazy — schema only), then maps
both column types into one canonical lattice and fails on ANY mismatch,
including int32-vs-int64 splits that the driver happens to tolerate
today (tolerance must never be load-bearing).

Usage: python tools/type_parity.py [sf_dir] [query ...]
Exit 0 = every oracle column type is identical to its Spark column.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB type name (uppercased, parameters stripped) -> canonical.
_DUCK = {
    "BOOLEAN": "bool",
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "UHUGEINT": "uint128",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BLOB": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamptz",
}

# Spark simpleString (parameters stripped) -> canonical.
_SPARK = {
    "boolean": "bool",
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def canon_duck(t) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal" + s[len("DECIMAL") :].replace(" ", "")
    if s.endswith("[]"):
        return "array<" + canon_duck(s[:-2]) + ">"
    if s.startswith("STRUCT"):
        return "struct"  # compared shallowly; no registry gate nests structs deeply
    return _DUCK.get(s, s.lower())


def canon_spark(dt) -> str:
    return _canon_spark_str(dt.simpleString())


def _canon_spark_str(s: str) -> str:
    # recurse like canon_duck so nested arrays canonicalize identically
    if s.startswith("decimal"):
        return s.replace(" ", "")
    if s.startswith("array<"):
        return "array<" + _canon_spark_str(s[len("array<") : -1]) + ">"
    if s.startswith("struct"):
        return "struct"
    return _SPARK.get(s, s)


def scan(sf_dir: str, only: set[str] | None = None):
    """Yield (name, [(col, duck_type, spark_type), ...]) mismatches."""
    import __spark_entry__ as entrymod
    from sonnerie_spark.session import get_spark

    spark = get_spark("type-parity", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        df = fn(spark, sf_dir)
        rel = con.sql(oracles[name])
        duck = {c: canon_duck(t) for c, t in zip(rel.columns, rel.types)}
        spk = {f.name: canon_spark(f.dataType) for f in df.schema.fields}
        bad = [
            (c, duck.get(c, "<missing>"), spk.get(c, "<missing>"))
            for c in sorted(set(duck) | set(spk))
            if duck.get(c) != spk.get(c)
        ]
        yield name, bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None
    n = bad_n = 0
    for name, bad in scan(sf_dir, only):
        n += 1
        if bad:
            bad_n += 1
            print(f"MISMATCH {name}:")
            for c, d, s in bad:
                print(f"    {c}: duckdb={d} spark={s}")
        else:
            print(f"ok {name}")
    print(f"\n{n} oracles scanned, {bad_n} with type mismatches")
    sys.exit(1 if bad_n else 0)


if __name__ == "__main__":
    main()
