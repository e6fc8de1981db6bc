"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Query inventory per SURVEY.md §2.3: the graph-database operator set
(add/modify/BFS/DFS/route/schedule/stats) over the derived tree of
FIXTURES.md §3, plus the training-data extension operators over
``documents``/``embeddings``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.catalog import (
    add_graph as _add_graph,
    modify_graph as _modify_graph,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dispatch import (
    route_counts,
    schedule_requests,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.stats import graph_stats
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.traverse import (
    bfs_level_order,
    bfs_levels,
    connected_count,
    dfs_leaves,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.graphs import (
    ROOT_VID,
    derived_tree_edges,
    requests_from_orders,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Shared derived-graph constructions (FIXTURES.md §3).
# Graph 1: root 999 -> regions -> nations(+100) -> customers(+1000).
# Graph 2 (for modify): initially star 998 -> nations(+100); replaced by the
# 3-level tree 998 -> regions -> nations(+100).
# ---------------------------------------------------------------------------

def _g2_initial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.lit(998).cast("long").alias("src"),
        (F.col("n_nationkey") + 100).cast("long").alias("dst"),
    )

def _g2_replacement_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.select(
        F.lit(998).cast("long").alias("src"),
        F.col("r_regionkey").cast("long").alias("dst"),
    ).unionAll(
        nation.select(
            F.col("n_regionkey").cast("long").alias("src"),
            (F.col("n_nationkey") + 100).cast("long").alias("dst"),
        )
    )

def _raw_tree_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived_tree_edges(spark, sf_dir, symmetric=False).select("src", "dst")

def _db_two_graphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g1 = derived_tree_edges(spark, sf_dir, symmetric=True, graph_id=1)
    g2 = _add_graph(_g2_initial_pairs(spark, sf_dir), graph_id=2)
    return g1.unionByName(g2)

# SQL fragments shared by the oracles (DuckDB dialect == ANSI here).
_SQL_E0 = """
  SELECT CAST(999 AS BIGINT) AS src, CAST(r_regionkey AS BIGINT) AS dst FROM region
  UNION ALL
  SELECT CAST(n_regionkey AS BIGINT), CAST(100 + n_nationkey AS BIGINT) FROM nation
  UNION ALL
  SELECT CAST(100 + c_nationkey AS BIGINT), CAST(1000 + c_custkey AS BIGINT) FROM customer
"""

_SQL_SYM = f"""
  WITH e0 AS ({_SQL_E0})
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
"""

_SQL_BFS = f"""
  WITH RECURSIVE e0 AS ({_SQL_E0}),
  bfs(vertex, level) AS (
    SELECT CAST(999 AS BIGINT), CAST(0 AS INTEGER)
    UNION ALL
    SELECT e0.dst, CAST(bfs.level + 1 AS INTEGER) FROM bfs JOIN e0 ON e0.src = bfs.vertex
  )
  SELECT vertex, level FROM bfs
"""

_SQL_REQUESTS = """
  SELECT CAST(o_orderkey AS INTEGER) AS seq_no,
         CAST(o_orderkey % 4 + 1 AS INTEGER) AS op_no,
         'G' || CAST(o_orderkey % 5 + 1 AS VARCHAR) || '.txt' AS graph_name,
         CASE WHEN (o_orderkey % 4 + 1) IN (3, 4)
              THEN CAST(o_orderkey % 20 + 1 AS INTEGER) END AS start_vertex
  FROM orders
"""

# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BFS hop-distance over the derived tree at
    sf0.001 (the reference's op 4, Spark-first)."""
    sf_dir = "/root/testdata/sf0.001"
    edges = derived_tree_edges(spark, sf_dir, symmetric=True)
    return bfs_levels(edges, ROOT_VID, graph_id=1)

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_add_graph(spark, sf_dir):
        return _add_graph(_raw_tree_pairs(spark, sf_dir), graph_id=1)

    def q_modify_graph(spark, sf_dir):
        return _modify_graph(
            _db_two_graphs(spark, sf_dir), _g2_replacement_pairs(spark, sf_dir), graph_id=2
        )

    def q_bfs_levels(spark, sf_dir):
        edges = derived_tree_edges(spark, sf_dir, symmetric=True)
        return bfs_levels(edges, ROOT_VID, graph_id=1)

    def q_bfs_order(spark, sf_dir):
        edges = derived_tree_edges(spark, sf_dir, symmetric=True)
        return bfs_level_order(edges, ROOT_VID, graph_id=1)

    def q_dfs_leaves(spark, sf_dir):
        edges = derived_tree_edges(spark, sf_dir, symmetric=True)
        return dfs_leaves(edges, ROOT_VID, graph_id=1)

    def q_route_requests(spark, sf_dir):
        return route_counts(requests_from_orders(spark, sf_dir))

    def q_request_sched(spark, sf_dir):
        return schedule_requests(requests_from_orders(spark, sf_dir))

    def q_graph_stats(spark, sf_dir):
        return graph_stats(_db_two_graphs(spark, sf_dir))

    def q_connected_count(spark, sf_dir):
        edges = derived_tree_edges(spark, sf_dir, symmetric=True)
        return connected_count(edges, ROOT_VID, graph_id=1)

    return {
        "q_add_graph": q_add_graph,
        "q_modify_graph": q_modify_graph,
        "q_bfs_levels": q_bfs_levels,
        "q_bfs_order": q_bfs_order,
        "q_dfs_leaves": q_dfs_leaves,
        "q_route_requests": q_route_requests,
        "q_request_sched": q_request_sched,
        "q_graph_stats": q_graph_stats,
        "q_connected_count": q_connected_count,
    }

def oracle_sql() -> dict[str, str]:
    return {
        "q_add_graph": f"""
            WITH e0 AS ({_SQL_E0}),
            canon AS (
              SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
              FROM e0 WHERE src <> dst
            )
            SELECT CAST(1 AS INTEGER) AS graph_id, src, dst FROM canon
            UNION ALL
            SELECT CAST(1 AS INTEGER), dst, src FROM canon
        """,
        "q_modify_graph": f"""
            WITH sym1 AS ({_SQL_SYM}),
            r0 AS (
              SELECT CAST(998 AS BIGINT) AS src, CAST(r_regionkey AS BIGINT) AS dst FROM region
              UNION ALL
              SELECT CAST(n_regionkey AS BIGINT), CAST(100 + n_nationkey AS BIGINT) FROM nation
            ),
            canon2 AS (
              SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
              FROM r0 WHERE src <> dst
            )
            SELECT CAST(1 AS INTEGER) AS graph_id, src, dst FROM sym1
            UNION ALL
            SELECT CAST(2 AS INTEGER), src, dst FROM canon2
            UNION ALL
            SELECT CAST(2 AS INTEGER), dst, src FROM canon2
        """,
        "q_bfs_levels": f"{_SQL_BFS}",
        "q_bfs_order": f"""
            WITH b AS ({_SQL_BFS})
            SELECT vertex, level,
                   CAST(ROW_NUMBER() OVER (ORDER BY level, vertex) AS INTEGER) AS pos
            FROM b
        """,
        "q_dfs_leaves": f"""
            WITH sym AS ({_SQL_SYM}),
            deg AS (SELECT src, COUNT(DISTINCT dst) AS d FROM sym GROUP BY src)
            SELECT CAST(src AS BIGINT) AS leaf FROM deg WHERE d = 1 AND src <> 999
        """,
        "q_route_requests": f"""
            WITH requests AS ({_SQL_REQUESTS})
            SELECT CASE WHEN op_no IN (1, 2) THEN 'primary'
                        WHEN seq_no % 2 = 0 THEN 'ss1' ELSE 'ss2' END AS route,
                   CAST(COUNT(*) AS BIGINT) AS n_requests
            FROM requests GROUP BY 1
        """,
        "q_request_sched": f"""
            WITH requests AS ({_SQL_REQUESTS})
            SELECT seq_no, op_no, graph_name, start_vertex,
                   CAST(ROW_NUMBER() OVER (ORDER BY seq_no) AS INTEGER) AS service_order
            FROM requests
        """,
        "q_graph_stats": f"""
            WITH sym1 AS ({_SQL_SYM}),
            g2 AS (
              SELECT CAST(998 AS BIGINT) AS src, CAST(100 + n_nationkey AS BIGINT) AS dst FROM nation
            ),
            db AS (
              SELECT 1 AS graph_id, src, dst FROM sym1
              UNION ALL SELECT 2, src, dst FROM g2
              UNION ALL SELECT 2, dst, src FROM g2
            ),
            deg AS (
              SELECT graph_id, src, COUNT(DISTINCT dst) AS degree
              FROM db GROUP BY graph_id, src
            )
            SELECT CAST(graph_id AS INTEGER) AS graph_id,
                   CAST(COUNT(*) AS BIGINT) AS n_vertices,
                   CAST(SUM(degree) / 2 AS BIGINT) AS n_edges,
                   CAST(MAX(degree) AS BIGINT) AS max_degree
            FROM deg GROUP BY graph_id
        """,
        "q_connected_count": f"""
            WITH b AS ({_SQL_BFS})
            SELECT CAST(COUNT(*) AS BIGINT) AS n_reachable FROM b
        """,
    }
