#!/usr/bin/env python
"""Self-check mimicking the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the given sf,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    import __spark_entry__ as em
    from kgce.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs, osql = em.queries(), em.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:28s} SPARK-ERROR {str(e)[:140]}")
            continue
        if name not in osql:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        try:
            rel = con.sql(osql[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB-ERROR {str(e)[:140]}")
            continue
        # driver compares columns sorted by name
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema {sorted(scols)} vs {sorted(ocols)}"))
            print(f"{name:28s} SCHEMA-MISMATCH {sorted(scols)} vs {sorted(ocols)}")
            continue
        sset = sorted(tuple(canon(r[i]) for i in sidx) for r in srows)
        oset = sorted(tuple(canon(r[i]) for i in oidx) for r in orows)
        if len(sset) != len(oset):
            failures.append((name, f"rowcount {len(sset)} vs {len(oset)}"))
            print(f"{name:28s} ROWCOUNT {len(sset)} vs {len(oset)}")
        elif sset != oset:
            bad = next(i for i, (a, b) in enumerate(zip(sset, oset)) if a != b)
            failures.append((name, f"values differ at {bad}: {sset[bad]} vs {oset[bad]}"))
            print(f"{name:28s} VALUES  e.g. {sset[bad]} vs {oset[bad]}")
        else:
            print(f"{name:28s} OK ({len(sset)} rows)")

    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
