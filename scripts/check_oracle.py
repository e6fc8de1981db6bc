"""Local replica of the driver's correctness gate: run each
``__spark_entry__.queries()`` entry at sf0.01 and compare against its
DuckDB ``oracle_sql()`` — row count, column names, and an
order-insensitive value comparison (sorted rows, columns sorted by
name, floats rounded).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py [sf_dir] --head N   # first N
       registry entries only — N=50 mirrors the driver's official
       verification window exactly (same derived rotation order).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

def norm_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out

def main() -> int:
    args = sys.argv[1:]
    head = 0
    if "--head" in args:
        i = args.index("--head")
        head = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if head:
        queries = dict(list(queries.items())[:head])
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {spark_t:.1f}s spark)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns differ: spark={sorted(scols)} duckdb={sorted(ocols)}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: row counts differ: spark={len(srows)} duckdb={len(orows)}")
            failures += 1
            continue
        ns, no = norm_rows(srows, scols), norm_rows(orows, ocols)
        if ns != no:
            diffs = [(a, b) for a, b in zip(ns, no) if a != b][:5]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            failures += 1
            continue
        print(f"ok   {name}: {len(srows)} rows match ({spark_t:.1f}s spark)")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0

if __name__ == "__main__":
    raise SystemExit(main())
