"""Third-engine verification for the iterative graph queries whose
DuckDB VALUE oracles are infeasible at decade scale (round-7 sweep:
q_pagerank spilled >78 GB of temp, q_connected_components hit the
100 GiB memory wall, q_scc blew a 600 s budget — all on the oracle
side; the Spark sides completed in 4-91 s).

The infeasibility is structural: those oracles replay iteration as
naive SQL (reachability-pair recursion is quadratic in component
size; unrolled PR rounds materialize the full rank table per round).
This script closes the verification gap with a THIRD implementation
per query — the graph is derived by DuckDB using the SAME CTE text
the oracle uses (imported from ``__spark_entry__``, single source of
truth), then the iteration runs in plain Python/numpy:

- q_pagerank              -> vectorized integer fixed-point PR
                             (np.add.at, floor division on
                             non-negative int64 — bit-exact)
- q_connected_components  -> union-find with min-id roots
- q_scc                   -> iterative Tarjan, component label =
                             min member id

and the result is compared EXACTLY (every row, every integer) to the
declared Spark query's output.  Agreement of two independent
implementations fed by a third engine's derivation is the same
evidential shape as the SQL oracle gate, at O(V + E) memory.

Usage: python scripts/verify_graph_scale.py [sf_dir]
       (default .scratch/sf10x0.1 — the round-7 decade scale-up)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

import __spark_entry__ as entry
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.session import (
    get_spark,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def ref_pagerank(con) -> dict[int, int]:
    """Integer fixed-point PR, the graphalgs.pagerank_fixed contract:
    scale 1e12, damping 85%, 5 rounds, floor division throughout.
    All quantities are non-negative, so numpy's floor `//` matches
    every engine's integer division."""
    sql = f"WITH {entry._sql_copurchase()} SELECT src, dst FROM ce"
    pairs = con.sql(sql).fetchnumpy()
    a, b = pairs["src"].astype(np.int64), pairs["dst"].astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    verts = np.unique(src)  # sorted, so searchsorted is an exact index map
    si = np.searchsorted(verts, src)
    di = np.searchsorted(verts, dst)
    n = len(verts)
    deg = np.bincount(si, minlength=n).astype(np.int64)
    scale, damping = 10**12, 85
    tele = (100 - damping) * scale // 100
    r = np.full(n, scale // n, dtype=np.int64)
    for _ in range(5):
        contrib = r[si] // deg[si]
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, di, contrib)
        r = tele // n + (damping * s) // 100
    return {int(v): int(r[i]) for i, v in enumerate(verts)}


def ref_connected_components(con) -> dict[int, int]:
    """Union-find over the derived tree minus the root (the q_cc
    fixture); component label = min vertex id (path-compressed,
    min-id roots)."""
    sql = f"WITH e0 AS ({entry._SQL_E0}) SELECT src, dst FROM e0 WHERE src <> 999 AND dst <> 999"
    rows = con.sql(sql).fetchall()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            # min-id root so the final find IS the component label
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo

    for s, d in rows:
        union(int(s), int(d))
    return {v: find(v) for v in list(parent)}


def ref_scc(con) -> dict[int, int]:
    """Iterative Tarjan over the top-2 trade digraph (the q_scc
    fixture CTEs verbatim); label = min member id."""
    sql = """
    WITH flows0 AS MATERIALIZED (
      -- MATERIALIZED fence: see the q_scc oracle note — without it
      -- DuckDB 1.0 plans customer NLJ supplier ON nationkey != and
      -- spills a 1.5e9-row intermediate at decade scale.
      SELECT CAST(c.c_nationkey AS BIGINT) AS a,
             CAST(s.s_nationkey AS BIGINT) AS b, COUNT(*) AS cnt
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    flows AS (SELECT a, b, cnt FROM flows0 WHERE a != b)
    SELECT a, b FROM (
      SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY cnt DESC, b) AS rk
      FROM flows) WHERE rk <= 2
    """
    arcs = [(int(a), int(b)) for a, b in con.sql(sql).fetchall()]
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for a, b in arcs:
        adj.setdefault(a, []).append(b)
        verts |= {a, b}
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    label: dict[int, int] = {}
    counter = [0]

    def strongconnect(v0: int) -> None:
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if not recurse:
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        label[w] = m
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return label


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10x0.1"
    con = connect(sf_dir)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    failures = 0

    got = {
        int(r["vertex"]): int(r["rank_scaled"])
        for r in qs["q_pagerank"](spark, sf_dir).collect()
    }
    want = ref_pagerank(con)
    ok = got == want
    failures += not ok
    print(f"{'ok  ' if ok else 'FAIL'} q_pagerank: {len(got)} vertices "
          f"{'bit-exact vs numpy integer PR' if ok else 'MISMATCH'}")

    cc = qs["q_connected_components"](spark, sf_dir).collect()
    got = {int(r["vertex"]): int(r["component"]) for r in cc}
    want = ref_connected_components(con)
    ok = got == want
    failures += not ok
    print(f"{'ok  ' if ok else 'FAIL'} q_connected_components: {len(got)} vertices "
          f"{'exact vs union-find' if ok else 'MISMATCH'}")

    got = {int(r["vertex"]): int(r["scc"]) for r in qs["q_scc"](spark, sf_dir).collect()}
    want = ref_scc(con)
    ok = got == want
    failures += not ok
    print(f"{'ok  ' if ok else 'FAIL'} q_scc: {len(got)} vertices "
          f"{'exact vs iterative Tarjan' if ok else 'MISMATCH'}")

    print("ALL OK" if not failures else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
