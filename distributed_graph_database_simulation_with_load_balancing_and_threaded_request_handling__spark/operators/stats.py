"""Graph statistics: the aggregate surface the reference computes only
implicitly (vertex/leaf counts into ``vertex_list[0]``,
secondary_server.c:97,206) generalized to per-graph aggregates.

One shuffle per aggregation level; map-side partial aggregation comes
free from groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def graph_stats(edges: DataFrame) -> DataFrame:
    """Per-graph: vertex count, undirected edge count, max degree.

    Expects a symmetric edge list; degree(v) = distinct out-neighbors,
    undirected edge count = directed rows / 2.
    """
    deg = edges.groupBy("graph_id", "src").agg(
        F.count_distinct("dst").alias("degree")
    )
    return deg.groupBy("graph_id").agg(
        F.count("*").cast("long").alias("n_vertices"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
        F.max("degree").cast("long").alias("max_degree"),
    )
