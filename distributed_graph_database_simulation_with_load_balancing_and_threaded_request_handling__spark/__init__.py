"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference distributed graph database simulation
(`Vicky072001/Distributed-Graph-Database-Simulation-with-Load-Balancing-
and-Threaded-Request-Handling-`).

The reference is a SysV-IPC client/load-balancer/server system whose
user-visible operations are: add graph (op 1), modify graph (op 2),
parallel DFS -> leaf set (op 3), parallel BFS -> level order (op 4),
plus request routing and scheduling.  This package re-expresses those
semantics Spark-first:

- graphs are `(graph_id, src, dst)` edge-list DataFrames (not dense
  adjacency matrices), partitionable by graph_id and scalable past the
  reference's 30-vertex / 100-graph caps,
- BFS is a level-synchronous iterative frontier join (each level = one
  Spark stage; the join barrier mirrors the reference's per-level
  pthread_join barrier at secondary_server.c:126-129),
- DFS-leaves uses the tree reduction (leaves of a tree rooted at s are
  exactly the degree-1 vertices != s) as a documented planner rewrite,
- routing/scheduling are declarative expressions over a `requests`
  DataFrame,
- concurrency control (the reference's per-graph semaphore RW locks) is
  replaced by immutable-snapshot semantics of Parquet writes.

Subpackages:
  sources/    readers & writers (Parquet tables, reference text-matrix
              compat format, derived-graph builders)
  operators/  traversal, catalog mutation, dispatch, stats, dedup,
              similarity, text analysis, multimodal plumbing
  functions/  reusable column expressions (JVM-side, codegen-friendly)
  plans/      planning helpers: tree fast-path rewrite, explain tooling
  streaming/  Structured Streaming request-loop analogue
"""

from .session import get_spark

__all__ = ["get_spark"]
