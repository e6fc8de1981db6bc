"""Engine operators: traversal (BFS/DFS), catalog mutation
(add/modify graph), request dispatch, graph statistics, and the
training-data extension suite (dedup, similarity, text, multimodal)."""

from .traverse import bfs_levels, bfs_level_order, dfs_leaves, connected_count
from .catalog import GraphCatalog, add_graph, modify_graph
from .dispatch import route_requests, schedule_requests, run_requests
from .stats import graph_stats

__all__ = [
    "bfs_levels",
    "bfs_level_order",
    "dfs_leaves",
    "connected_count",
    "GraphCatalog",
    "add_graph",
    "modify_graph",
    "route_requests",
    "schedule_requests",
    "run_requests",
    "graph_stats",
]
