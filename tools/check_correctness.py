#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, sorted column names, and exact values (order-insensitive).
Reports per-query PASS/FAIL with diffs; exits nonzero on any FAIL.

Usage: python tools/check_correctness.py [--typed] [sf_dir] [query ...]

``--typed`` additionally compares the DuckDB relation's bound column
types against the Spark result schema through the canonical lattice in
tools/type_parity.py and fails on ANY width/type difference.  The plain
value compare canonicalizes to Python scalars, which is exactly why the
r7 ``bm25_topk`` red (DuckDB HUGEINT vs Spark BIGINT — identical
values, different width, typed driver hash flips) was invisible locally
for two rounds; typed mode sees what the driver sees.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "timestamp") and not isinstance(v, (int, float)):  # datetime
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def rows_to_canonical(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def main():
    argv = [a for a in sys.argv[1:] if a != "--typed"]
    typed = "--typed" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if typed:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from type_parity import canon_duck, canon_spark

    import __spark_entry__ as entrymod
    from sonnerie_spark.session import get_spark

    spark = get_spark("correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            orows = rel.fetchall()
            ocols = rel.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if typed:
            duck = {c: canon_duck(t) for c, t in zip(rel.columns, rel.types)}
            spk = {f.name: canon_spark(f.dataType) for f in df.schema.fields}
            for c in sorted(set(duck) | set(spk)):
                if duck.get(c) != spk.get(c):
                    problems.append(
                        f"type: {c}: oracle={duck.get(c)} spark={spk.get(c)}"
                    )
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sc = rows_to_canonical([tuple(r) for r in srows], scols)
            oc = rows_to_canonical(orows, ocols)
            if sc != oc:
                n_bad = sum(1 for a, b in zip(sc, oc) if a != b)
                problems.append(f"values: {n_bad}/{len(sc)} rows differ")
                for a, b in list(zip(sc, oc))[:2000]:
                    if a != b:
                        problems.append(f"  spark : {a}")
                        problems.append(f"  oracle: {b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        # operators that persist intermediates (span streams, simhash
        # signatures) must not accumulate storage across the 129-gate
        # sweep — same per-query isolation bench.py applies
        spark.catalog.clearCache()

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
