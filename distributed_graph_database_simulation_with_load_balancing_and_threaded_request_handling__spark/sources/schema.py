"""Explicit StructType schemas (schema-on-write, no inference).

The reference's only schema is the fixed C struct
``struct shmseg { int n; int adj[30][30]; }`` (primary_server.c:25-29)
plus the flat request string ``"<seq_no> <op_no> <filename>"``
(client (1).c:105).  Here those become declared columnar schemas; the
dense matrix becomes an edge list (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The graph database: one row per directed edge; undirected graphs store
# both (u,v) and (v,u).  graph_id is the reference's gno
# (primary_server.c:71-78, "G<digits>.txt" -> digits).
GRAPH_EDGES_SCHEMA = StructType(
    [
        StructField("graph_id", IntegerType(), nullable=False),
        StructField("src", LongType(), nullable=False),
        StructField("dst", LongType(), nullable=False),
    ]
)

GRAPH_VERTICES_SCHEMA = StructType(
    [
        StructField("graph_id", IntegerType(), nullable=False),
        StructField("vid", LongType(), nullable=False),
    ]
)

# The reference's request message "<seq_no> <op_no> <filename>" plus the
# shm payload (start vertex for ops 3/4).  op_no: 1=add, 2=modify,
# 3=dfs-leaves, 4=bfs (client (1).c:26-32).
REQUESTS_SCHEMA = StructType(
    [
        StructField("seq_no", IntegerType(), nullable=False),
        StructField("op_no", IntegerType(), nullable=False),
        StructField("graph_name", StringType(), nullable=False),
        StructField("start_vertex", IntegerType(), nullable=True),
    ]
)
