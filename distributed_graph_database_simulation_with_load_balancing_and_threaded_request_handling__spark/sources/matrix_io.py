"""Compatibility reader/writer for the reference's on-disk graph
format (O7/O8): a text file whose first line is ``n`` followed by n
lines of n whitespace-separated ints; nonzero cell = edge.

Writer semantics follow primary_server.c:145-151 (``fprintf`` of n then
the matrix rows); reader semantics follow secondary_server.c:272-286
(``fscanf`` loop).  The reference treats any nonzero cell as an edge on
the BFS path (secondary_server.c:83) and ==1 on the DFS path
(secondary_server.c:162); since all shipped data is 0/1 the engine
standardizes on nonzero-as-edge.

Scale note: this format is a dense n x n matrix with a hard reference
cap of n=30 (primary_server.c:18) — a small-graph compatibility shim,
deliberately parsed driver-side.  Large graphs use the Parquet
edge-list tables; nothing at 100 TB flows through here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schema import GRAPH_EDGES_SCHEMA

def read_adjacency_text(
    spark: SparkSession,
    path: str,
    *,
    graph_id: int = 1,
    one_indexed: bool = True,
    cell_rule: str = "nonzero",
) -> DataFrame:
    """Parse a reference-format graph file into a (graph_id, src, dst)
    edge-list DataFrame (both matrix directions preserved).

    Row/column indices are 0-based in the file; user-facing vertex ids
    are 1-indexed (the reference increments on output,
    secondary_server.c:318), so the default shifts by +1.

    ``cell_rule`` makes the reference's cell-interpretation divergence
    explicit and selectable: its BFS follows ANY nonzero cell
    (``g[node][i] > 0``, secondary_server.c:83) while its DFS follows
    only ``== 1`` cells (secondary_server.c:162) — behaviors that
    coincide on every shipped 0/1 matrix but diverge on a multi-valued
    cell.  The engine standardizes on ``"nonzero"`` (the BFS rule);
    pass ``"eq1"`` to reproduce the reference DFS's reading of a
    weighted matrix.  The divergence fixture is pinned in
    tests/test_matrix_io.py.
    """
    return spark.createDataFrame(
        parse_adjacency_text(
            path, graph_id=graph_id, one_indexed=one_indexed, cell_rule=cell_rule
        ),
        schema=GRAPH_EDGES_SCHEMA,
    )


def parse_adjacency_text(
    path: str,
    *,
    graph_id: int = 1,
    one_indexed: bool = True,
    cell_rule: str = "nonzero",
) -> list[tuple[int, int, int]]:
    """The O8 parse itself (driver-side, pure Python): the row list
    behind ``read_adjacency_text``, exposed so multi-file loads (e.g.
    q_assignment_replay's 14-graph corpus) can assemble ONE local
    relation instead of unioning per-file DataFrames."""
    if cell_rule not in ("nonzero", "eq1"):
        raise ValueError(f"cell_rule must be 'nonzero' or 'eq1', got {cell_rule!r}")
    with open(path) as f:
        tokens = f.read().split()
    n = int(tokens[0])
    cells = tokens[1:]
    if len(cells) < n * n:
        raise ValueError(f"{path}: expected {n * n} matrix cells, found {len(cells)}")
    shift = 1 if one_indexed else 0
    keep = (lambda v: v != 0) if cell_rule == "nonzero" else (lambda v: v == 1)
    return [
        (graph_id, r + shift, c + shift)
        for r in range(n)
        for c in range(n)
        if keep(int(cells[r * n + c]))
    ]

def write_adjacency_text(edges: DataFrame, path: str, *, one_indexed: bool = True) -> None:
    """Serialize one graph's edge list back to the reference text
    format (n, then n rows of n space-separated ints)."""
    shift = 1 if one_indexed else 0
    pairs = [
        (int(r["src"]) - shift, int(r["dst"]) - shift)
        for r in edges.select("src", "dst").collect()
    ]
    n = max((max(s, d) for s, d in pairs), default=-1) + 1
    adj = [[0] * n for _ in range(n)]
    for s, d in pairs:
        adj[s][d] = 1
        adj[d][s] = 1
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{n}\n")
        for row in adj:
            f.write(" ".join(map(str, row)) + "\n")
    os.replace(tmp, path)
