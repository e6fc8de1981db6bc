"""Request planner: maps each reference operation (the op_no menu,
client (1).c:26-32) to the engine strategy that executes it.

Catalyst owns everything relational (pushdown, pruning, join
selection, codegen — SURVEY.md §4: no custom Catalyst work needed).
What Catalyst cannot express lives here as *documented planning
rules*:

R1 (tree DFS-leaves reduction).  For a tree rooted at s, the DFS leaf
    set — "a node appears in the output iff it becomes a leaf node
    when the tree is rooted at the starting vertex" (Sample IO doc) —
    is traversal-order-independent and equals the degree-1 vertices
    minus the root.  So op 3 on a tree needs NO traversal: one
    degree aggregation replaces the reference's thread-per-edge
    recursion (secondary_server.c:160-170).  The reference itself
    assumes treeness (secondary_server.c:82), making this the default.

R2 (level-synchronous iteration).  Spark SQL has no recursive CTE, so
    op 4 (and op 3 on non-trees, which must orient the graph first)
    runs as a driver-side frontier loop where each level is one
    Catalyst-planned job and the shuffle is the level barrier — the
    1:1 image of the reference's per-level pthread_join barrier
    (secondary_server.c:126-129).

R3 (write-path partition overwrite).  Ops 1/2 become atomic
    errorifexists/overwrite writes of one graph_id partition; the
    per-graph semaphore RW protocol (primary_server.c:106-135) is
    subsumed by snapshot-isolated immutable Parquet.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TraversalPlan:
    """One planned reference operation."""

    op_no: int
    op: str
    route: str  # which server class the reference would run this on
    strategy: str  # engine execution strategy
    rule: str  # which planning rule picked it
    rationale: str

    def explain(self) -> str:
        return (
            f"op {self.op_no} ({self.op}) -> {self.route}\n"
            f"  strategy: {self.strategy} [{self.rule}]\n"
            f"  why: {self.rationale}"
        )


OPS = {1: "add_graph", 2: "modify_graph", 3: "dfs_leaves", 4: "bfs_levels"}


def plan_request(op_no: int, *, assume_tree: bool = True) -> TraversalPlan:
    """Pick the execution strategy for one operation.  ``assume_tree``
    mirrors the reference's operating envelope (all 14 assignment
    graphs are trees); pass False to force the general orientation
    path for op 3."""
    if op_no == 1:
        return TraversalPlan(
            1, OPS[1], "primary", "partition-append (errorifexists)", "R3",
            "ingest = atomic write of a new graph_id partition",
        )
    if op_no == 2:
        return TraversalPlan(
            2, OPS[2], "primary", "partition-overwrite", "R3",
            "wholesale replace of one graph_id partition (the reference "
            "rewrites the whole file, primary_server.c:138-153)",
        )
    if op_no == 3 and assume_tree:
        return TraversalPlan(
            3, OPS[3], "secondary", "degree-aggregation", "R1",
            "tree leaf set == degree-1 vertices minus root; one groupBy "
            "replaces the traversal entirely",
        )
    if op_no == 3:
        return TraversalPlan(
            3, OPS[3], "secondary", "bfs-orientation + no-child anti-join", "R2",
            "non-tree input: orient by BFS levels, leaves have no "
            "neighbor one level deeper",
        )
    if op_no == 4:
        return TraversalPlan(
            4, OPS[4], "secondary", "iterative frontier join (superstep per level)", "R2",
            "no recursive CTE in Spark SQL; each level is one job, the "
            "shuffle is the level barrier",
        )
    raise ValueError(f"unknown op_no {op_no} (valid: 1-4, client (1).c:26-32)")


def explain_requests(requests: DataFrame, *, assume_tree: bool = True) -> DataFrame:
    """Planner output as data: each request row tagged with the
    strategy/rule the engine will use — the engine's EXPLAIN for the
    request workload.  Pure projection (no shuffle)."""
    strategy = F.lit(None).cast("string")
    rule = F.lit(None).cast("string")
    for op in (1, 2, 3, 4):
        p = plan_request(op, assume_tree=assume_tree)
        strategy = F.when(F.col("op_no") == op, F.lit(p.strategy)).otherwise(strategy)
        rule = F.when(F.col("op_no") == op, F.lit(p.rule)).otherwise(rule)
    return requests.select("*", strategy.alias("strategy"), rule.alias("rule"))
