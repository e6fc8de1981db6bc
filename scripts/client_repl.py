"""Interactive client analogue of the reference's menu-loop client
(client (1).c:26-73): replay an ``inp.txt``-format request stream —
or type requests interactively — against the engine's graph catalog.

Token protocol (exactly the reference client's scanf sequence,
client (1).c:59-155):

    <seq_no> <op_no> <graph_name>
    op 1/2 (add/modify): <n> then n*n matrix cells
    op 3/4 (DFS/BFS):    <start_vertex> (0-based array index, as the
                         raw int the client ships through shared
                         memory; replies are 1-indexed, the
                         secondary_server.c:318 +1 convention)

Usage:
    python scripts/client_repl.py [inp_file] [--db DIR]

With no ``inp_file``, reads the same token stream from stdin (the
interactive menu session).  ``--db`` persists the graph catalog
across sessions; default is a per-run temp dir (the reference's
server also starts empty, instructions.txt).

This is a convenience surface, not a query capability: every
operation routes through the SAME operators the declared queries
exercise (GraphCatalog add/modify, run_requests dispatch,
format_reply O12).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _graph_id(name: str) -> int:
    """'G<k>.txt' -> k (the reference registers graphs by this number,
    primary_server.c:68 gnos[])."""
    stem = name.split(".", 1)[0]
    digits = "".join(ch for ch in stem if ch.isdigit())
    if not digits:
        raise ValueError(f"graph name {name!r} carries no number")
    return int(digits)


def run_session(spark, tokens: list[str], db_path: str) -> list[str]:
    """Process one client session's token stream; returns the printed
    reply lines (one per request, '<seq_no>: <reply>')."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.catalog import (
        GraphCatalog,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dispatch import (
        format_reply,
        run_requests,
    )

    cat = GraphCatalog(spark, db_path)
    out: list[str] = []
    it = iter(tokens)

    def nxt() -> str:
        return next(it)

    while True:
        try:
            seq_no = int(nxt())
        except StopIteration:
            break
        op_no = int(nxt())
        graph_name = nxt()
        gid = _graph_id(graph_name)
        if op_no in (1, 2):
            n = int(nxt())
            cells = [int(nxt()) for _ in range(n * n)]
            # Any nonzero cell is an edge; indices 0-based in the wire
            # matrix, vertices 1-indexed in the engine (the matrix_io
            # convention, sources/matrix_io.py).
            pairs = [
                (r + 1, c + 1)
                for r in range(n)
                for c in range(n)
                if cells[r * n + c] != 0
            ]
            pdf = spark.createDataFrame(pairs or [(0, 0)], "src long, dst long")
            if not pairs:
                pdf = pdf.where(F.lit(False))
            try:
                if op_no == 1:
                    cat.add_graph(gid, pdf)
                    out.append(f"{seq_no}: added {graph_name} (n={n})")
                else:
                    cat.modify_graph(gid, pdf)
                    out.append(f"{seq_no}: modified {graph_name} (n={n})")
            except ValueError as ex:
                out.append(f"{seq_no}: error: {ex}")
        elif op_no in (3, 4):
            start0 = int(nxt())
            reqs = spark.createDataFrame(
                [(seq_no, op_no, graph_name, start0 + 1)],
                "seq_no int, op_no int, graph_name string, start_vertex int",
            )
            edges = cat.edges(gid)
            reply_rows = format_reply(run_requests(reqs, edges)).collect()
            reply = reply_rows[0]["reply"] if reply_rows else ""
            out.append(f"{seq_no}: {reply}")
        else:
            out.append(f"{seq_no}: error: unknown op {op_no}")
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    db = None
    if "--db" in args:
        i = args.index("--db")
        db = args[i + 1]
        del args[i : i + 2]
    src = open(args[0]).read() if args else sys.stdin.read()
    if db is None:
        db = tempfile.mkdtemp(prefix="client_repl_gdb_")

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.session import (
        get_spark,
    )

    spark = get_spark("client-repl")
    spark.sparkContext.setLogLevel("ERROR")
    for line in run_session(spark, src.split(), db):
        print(line)


if __name__ == "__main__":
    main()
