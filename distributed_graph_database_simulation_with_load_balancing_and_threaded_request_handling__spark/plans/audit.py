"""Static physical-plan analysis helpers shared by scripts/audit_plans.py
(the PLANS.md generator) and tests/test_plans.py (the CI lint).

The round-12 addition is the GLOBAL-WINDOW guard (round-11 verdict #6):
a ``Window`` with an empty partition spec serializes its entire input
through one task, which is fine over a bounded relation (a top-k's ≤k
rows, a per-group aggregate, a literal table) and catastrophic over a
data-sized one.  Every global window in the engine today is bounded by
construction (e.g. similarity.cosine_topk ranks rows that a
TakeOrderedAndProject already cut to k); this module turns that
by-construction argument into a checked property so a future regression
that parks a global window on a raw scan fails CI instead of shipping.
"""

from __future__ import annotations

# Subtree markers that bound a global window's input cardinality:
#  - limits / top-k: the input is ≤ k rows by definition;
#  - aggregates: the input is one row per group — every global window
#    the engine emits over an agg child groups on a bounded key
#    (per-level counts, per-version manifests, k centroids, ...);
#  - LocalTableScan / OneRowRelation: literal driver-side relations;
#  - a nested WindowGroupLimit has already cut to per-group k.
_BOUNDING_MARKERS = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "WindowGroupLimit",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "LocalTableScan",
    "OneRowRelation",
    "ReusedExchange",  # points at an exchange proven elsewhere in plan
)

# Leaf markers that make an UNBOUNDED judgment certain: the window's
# subtree reaches a (potentially) data-sized relation with nothing
# bounding in between.  InMemoryTableScan is deliberately NEITHER a
# scan nor a bound: the plan text duplicates the cached tree below it,
# so the walk descends and judges the cached plan itself (a cached
# top-k shows its TakeOrderedAndProject; a cached raw table bottoms
# out in a file scan).
_DATA_SCAN_MARKERS = (
    "Scan parquet",
    "FileScan",
    "Scan orc",
    "Scan csv",
    "Scan json",
    "Scan text",
    "BatchScan",
    "Scan ExistingRDD",
    "Range (",
)


def _node_lines(plan: str) -> list[tuple[int, str]]:
    """(depth, node_text) per tree line.  Depth is the column where the
    node name starts (tree art is drawn with ' ', ':', '+', '-'); a
    whole-stage-codegen prefix ``*(n) `` is stripped from the node text
    so marker matching sees the operator name."""
    out: list[tuple[int, str]] = []
    for line in plan.splitlines():
        i = 0
        while i < len(line) and line[i] in " :+-":
            i += 1
        if i >= len(line):
            continue
        node = line[i:]
        if node.startswith("*(") and ") " in node:
            node = node.split(") ", 1)[1]
        out.append((i, node))
    return out


def _top_level_groups(s: str) -> list[str]:
    """The top-level ``[...]`` group contents of a Window argument
    string, in order."""
    depth = 0
    groups: list[str] = []
    start = -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0 and start >= 0:
                groups.append(s[start:i])
                start = -1
    return groups


def _is_global_window(node: str) -> bool:
    """A WindowExec prints ``Window [exprs], [partitionSpec],
    [orderSpec]`` with EMPTY Seq args elided.  Three groups =
    partitioned.  Two groups is ambiguous — the second is either the
    partition spec (window with no ORDER BY) or the order spec (global
    window): order-spec entries always carry a sort direction
    (``ASC``/``DESC``), partition columns never do.  One group =
    neither partition nor order = global."""
    groups = _top_level_groups(node)
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        return " ASC" in groups[1] or " DESC" in groups[1]
    return True


def global_windows(plan: str) -> list[dict]:
    """One record per GLOBAL (empty-partition-spec) Window operator in
    the plan text: ``{"line": node_text, "bounded": bool, "reason": str}``.

    Global-vs-partitioned is decided by ``_is_global_window`` (bracket
    groups + sort-direction markers — empty Seq args are elided from
    the printed node, so group COUNT alone is ambiguous).
    WindowGroupLimit nodes are not windows and are skipped.

    Bounded judgment walks the window's child subtree top-down: the
    FIRST bounding marker (limit/top-k/aggregate/local relation) on
    every root-to-leaf path wins; a path that reaches a file scan with
    no bounding node in between is unbounded.  Implemented as: bounded
    iff no data-scan line appears in the subtree before (shallower
    than or without) a bounding ancestor.
    """
    lines = _node_lines(plan)
    found: list[dict] = []
    for idx, (depth, node) in enumerate(lines):
        if not node.startswith("Window "):
            continue
        if not _is_global_window(node):
            continue
        # subtree: following lines strictly deeper than the window
        subtree: list[tuple[int, str]] = []
        for d2, n2 in lines[idx + 1 :]:
            if d2 <= depth:
                break
            subtree.append((d2, n2))
        # Walk the subtree; remember the shallowest still-active
        # bounding depth.  A data scan is only a violation if no
        # bounding node sits between it and the window.
        bound_depths: list[int] = []
        reason = "no child (leaf window)"
        unbounded_scan = None
        for d2, n2 in subtree:
            bound_depths = [bd for bd in bound_depths if bd < d2]
            if any(m in n2 for m in _BOUNDING_MARKERS):
                if not bound_depths:
                    reason = f"bounded by {n2.split('(', 1)[0].split(' ', 1)[0]}"
                bound_depths.append(d2)
                continue
            if not bound_depths and any(m in n2 for m in _DATA_SCAN_MARKERS):
                unbounded_scan = n2
                break
        if unbounded_scan is not None:
            found.append(
                {
                    "line": node[:160],
                    "bounded": False,
                    "reason": f"reaches data scan with no bound: {unbounded_scan[:80]}",
                }
            )
        else:
            found.append({"line": node[:160], "bounded": True, "reason": reason})
    return found
