"""Property-based tests (SURVEY.md §5): random trees, engine BFS
levels vs a pure-python shortest-path oracle, DFS leaves vs the
degree-1 characterization — the invariants the reference's golden
docs state in prose ("order does not matter", leaf-set definition).
"""

from collections import deque

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import make_edges
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.traverse import (
    bfs_levels,
    dfs_leaves,
)


@st.composite
def random_tree(draw):
    """Random labeled tree on 2..12 vertices (1-indexed): vertex i
    attaches to a uniformly drawn earlier vertex — every labeled tree
    shape is reachable, matching the reference's corpus (trees n<=20)."""
    n = draw(st.integers(min_value=2, max_value=12))
    pairs = [
        (draw(st.integers(min_value=1, max_value=i - 1)), i) for i in range(2, n + 1)
    ]
    start = draw(st.integers(min_value=1, max_value=n))
    return pairs, start


def python_bfs_levels(pairs, start):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {start: 0}
    q = deque([start])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=random_tree())
def test_bfs_levels_match_python_oracle(sess, tree):
    pairs, start = tree
    edges = make_edges(sess, pairs)
    got = {r["vertex"]: r["level"] for r in bfs_levels(edges, start).collect()}
    assert got == python_bfs_levels(pairs, start)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=random_tree())
def test_dfs_leaves_fast_and_general_paths_agree(sess, tree):
    pairs, start = tree
    edges = make_edges(sess, pairs)
    degree = {}
    for u, v in pairs:
        degree[u] = degree.get(u, 0) + 1
        degree[v] = degree.get(v, 0) + 1
    expected = {v for v, d in degree.items() if d == 1 and v != start}
    fast = {r["leaf"] for r in dfs_leaves(edges, start).collect()}
    general = {r["leaf"] for r in dfs_leaves(edges, start, assume_tree=False).collect()}
    assert fast == expected
    assert general == expected
