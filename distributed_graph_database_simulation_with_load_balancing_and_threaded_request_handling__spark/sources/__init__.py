"""Readers and writers: Parquet tables, reference text-matrix compat
format, and derived-graph builders over the driver testdata."""

from .schema import GRAPH_EDGES_SCHEMA, GRAPH_VERTICES_SCHEMA, REQUESTS_SCHEMA
from .tables import load_table, load_tables
from .graphs import derived_tree_edges, edges_from_pairs, requests_from_orders
from .matrix_io import read_adjacency_text, write_adjacency_text

__all__ = [
    "GRAPH_EDGES_SCHEMA",
    "GRAPH_VERTICES_SCHEMA",
    "REQUESTS_SCHEMA",
    "load_table",
    "load_tables",
    "derived_tree_edges",
    "edges_from_pairs",
    "requests_from_orders",
    "read_adjacency_text",
    "write_adjacency_text",
]
