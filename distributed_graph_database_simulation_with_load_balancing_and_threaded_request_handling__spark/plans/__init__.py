"""Planning layer: the engine-side rewrites Catalyst cannot express
(SURVEY.md §4) — unbounded traversal iteration and the DFS-leaves tree
reduction — plus explain tooling for the four reference operations."""

from .planner import (
    OPS,
    TraversalPlan,
    explain_requests,
    plan_request,
)

__all__ = ["OPS", "TraversalPlan", "plan_request", "explain_requests"]
