"""Deterministic scale-up of the driver's sf0.1 testdata for scale
sweeps beyond the shipped directories (TESTDATA.md tops out at sf0.1;
the 100 TB posture claims want at least one decade more headroom
exercised — round-6 verdict #6).

NOT a replacement for driver data: the oracle gate still runs against
/root/testdata for official records.  This produces an sf1-equivalent
(~6M lineitem rows) under .scratch/ by key-shifted replication of
sf0.1 — copy c adds ``c * stride`` to every key column, preserving
referential integrity (o_custkey shifts by the customer stride,
l_partkey by the part stride, ...), while payload columns repeat.
Replicated payloads are a deliberate stress: documents gain exact 10x
mirror families (dedup), embeddings gain exact ties (deterministic
tie-break discipline), timestamps densify 10x (windows/sessions).
region/nation stay fixed (bounded dims at every scale).

Usage: python scripts/gen_scaled_testdata.py [factor] [src_dir] [out_dir]
           [--tables t1,t2,...]
Defaults: 10 /root/testdata/sf0.1 <repo>/.scratch/sf10x0.1

``--tables`` restricts the replicated tables (region/nation are always
copied) — the round-9 100x GRAPH-FAMILY gate only needs
customer/supplier/orders/lineitem, and the full 100x set would not fit
the container disk."""

from __future__ import annotations

import os
import sys

import duckdb

# key column -> stride source table (max+1 of the ORIGINAL table);
# every key is dense 0-based in the driver data, so stride = row count
# of the owning table.
STRIDES = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "_users",  # events.user_id has its own dense domain
    "doc_id": "documents",
    "vec_id": "embeddings",
}

COPY_TABLES = (
    "customer supplier part orders lineitem events documents embeddings".split()
)
FIXED_TABLES = "region nation".split()


def main() -> None:
    argv = list(sys.argv[1:])
    only: list[str] | None = None
    if "--tables" in argv:
        i = argv.index("--tables")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    factor = int(argv[0]) if len(argv) > 0 else 10
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (
        argv[2]
        if len(argv) > 2
        else os.path.join(root, ".scratch", f"sf{factor}x0.1")
    )
    copy_tables = [t for t in COPY_TABLES if only is None or t in only]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for t in COPY_TABLES:
        strides[t] = con.sql(
            f"SELECT COUNT(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
    if "events" in copy_tables:
        strides["_users"] = (
            con.sql(
                f"SELECT MAX(user_id) + 1 FROM '{src}/events.parquet'"
            ).fetchone()[0]
        )

    for t in FIXED_TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
        )
        print(f"{t}: copied fixed")

    for t in copy_tables:
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + copies.c * {strides[STRIDES[c]]} AS {c}" if c in STRIDES else c
            for c in cols
        )
        con.sql(
            f"""COPY (
              SELECT {sel}
              FROM '{src}/{t}.parquet'
              CROSS JOIN (SELECT unnest(range({factor})) AS c) copies
              ORDER BY copies.c
            ) TO '{out}/{t}.parquet'"""
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
