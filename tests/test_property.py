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


# --- whole-graph analytics (graphalgs) vs pure-python oracles ---

from itertools import combinations

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
    kcore,
    triangle_counts,
)


@st.composite
def random_graph(draw):
    """Random simple graph on 4..10 vertices: each possible edge kept
    with probability ~1/2 (drawn as a bitmask) — cyclic, disconnected,
    and hub-heavy shapes all reachable."""
    n = draw(st.integers(min_value=4, max_value=10))
    all_pairs = list(combinations(range(1, n + 1), 2))
    mask = draw(st.lists(st.booleans(), min_size=len(all_pairs), max_size=len(all_pairs)))
    pairs = [p for p, keep in zip(all_pairs, mask) if keep]
    return pairs


def python_triangle_counts(pairs):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


def python_kcore(pairs, k):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=random_graph())
def test_triangle_counts_match_python_oracle(sess, pairs):
    if not pairs:
        return
    df = sess.createDataFrame(pairs, "src long, dst long")
    for strategy in ("adjacency", "wedge"):
        got = {
            r.vertex: r.triangles
            for r in triangle_counts(df, strategy=strategy).collect()
        }
        assert got == python_triangle_counts(pairs), strategy


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=random_graph(), k=st.integers(min_value=2, max_value=4))
def test_kcore_matches_python_oracle(sess, pairs, k):
    if not pairs:
        return
    df = sess.createDataFrame(pairs, "src long, dst long")
    got = {r.vertex: r.core_degree for r in kcore(df, k).collect()}
    assert got == python_kcore(pairs, k)


def python_mis(pairs):
    """Pure-python replay of the Luby rounds with the same md5
    priorities — the exact algorithm, not just the properties."""
    import hashlib

    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    active, out, rnd = set(adj), {}, 0
    while active:
        pri = {
            v: (hashlib.md5(f"mis:{v}:{rnd}".encode()).hexdigest(), v)
            for v in active
        }
        winners = {
            v for v in active if all(pri[v] < pri[u] for u in adj[v] & active)
        }
        retired = set(winners)
        for w in winners:
            retired |= adj[w]
        active -= retired
        for w in winners:
            out[w] = rnd
        rnd += 1
    return out


def python_ktruss(pairs, k):
    canon = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    cur = set(canon)
    while True:
        sup = {e: 0 for e in cur}
        verts = sorted({x for e in cur for x in e})
        for a, b, c in combinations(verts, 3):
            if (a, b) in cur and (a, c) in cur and (b, c) in cur:
                for e in ((a, b), (a, c), (b, c)):
                    sup[e] += 1
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return {e: sup[e] for e in cur}
        cur = nxt


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=random_graph())
def test_mis_matches_python_oracle(sess, pairs):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        maximal_independent_set,
    )

    if not pairs:
        return
    df = sess.createDataFrame(pairs, "src long, dst long")
    got = {
        r.vertex: r.mis_round for r in maximal_independent_set(df).collect()
    }
    assert got == python_mis(pairs)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=random_graph(), k=st.integers(min_value=3, max_value=4))
def test_ktruss_matches_python_oracle(sess, pairs, k):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        ktruss,
    )

    if not pairs:
        return
    df = sess.createDataFrame(pairs, "src long, dst long")
    got = {(r.src, r.dst): r.support for r in ktruss(df, k).collect()}
    assert got == python_ktruss(pairs, k)


def python_betweenness(pairs, sources, scale=10**9):
    """Pure-python replay of the integer-exact Brandes sweep."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    bc = defaultdict(int)
    for s in sources:
        if s not in adj:
            continue
        level = {s: 0}
        sigma = {s: 1}
        q = deque([s])
        order = [s]
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in level:
                    level[w] = level[u] + 1
                    sigma[w] = 0
                    q.append(w)
                    order.append(w)
                if level[w] == level[u] + 1:
                    sigma[w] += sigma[u]
        delta = defaultdict(int)
        for w in reversed(order):
            for v in adj[w]:
                if level.get(v) == level[w] - 1:
                    delta[v] += sigma[v] * (scale + delta[w]) // sigma[w]
        for v, d in delta.items():
            if v != s:
                bc[v] += d
    return {v: x for v, x in bc.items() if x > 0}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=random_graph(),
    n_sources=st.integers(min_value=1, max_value=4),
    probe_every=st.integers(min_value=1, max_value=3),
)
def test_betweenness_matches_python_oracle(sess, pairs, n_sources, probe_every):
    # Round-8 verdict #8 strengthening: vary the SOURCE COUNT (the
    # q_betweenness production shape rides 4 sources on one frontier)
    # and the PROBE CHAIN length — probe_every > 1 on graphs this small
    # exercises the zero-tail recount path (chain overshoots the true
    # depth, the non-empty prefix is recovered from materialized
    # frames), which is the riskiest machinery in the loop.
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        betweenness_sampled,
    )

    if not pairs:
        return
    sym = pairs + [(b, a) for a, b in pairs]
    df = sess.createDataFrame(sym, "src long, dst long")
    sources = sorted({x for p in pairs for x in p})[:n_sources]
    srcs = sess.createDataFrame([(s,) for s in sources], "start long")
    got = {
        r.vertex: r.bc_scaled
        for r in betweenness_sampled(df, srcs, probe_every=probe_every).collect()
    }
    assert got == python_betweenness(pairs, sources)


def python_four_cliques(pairs):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for a, b, c, d in combinations(sorted(adj), 4):
        if (
            b in adj[a] and c in adj[a] and d in adj[a]
            and c in adj[b] and d in adj[b] and d in adj[c]
        ):
            for x in (a, b, c, d):
                counts[x] = counts.get(x, 0) + 1
    return counts


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=random_graph())
def test_four_cliques_match_python_oracle(sess, pairs):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        four_clique_counts,
    )

    if not pairs:
        return
    df = sess.createDataFrame(pairs, "src long, dst long")
    got = {r.vertex: r.cliques4 for r in four_clique_counts(df).collect()}
    assert got == python_four_cliques(pairs)


def python_kruskal_max(weighted):
    """Unique maximum spanning forest under the (w DESC, src, dst)
    total order — the independent oracle for the Borůvka operator."""
    par = {}

    def find(x):
        while par.setdefault(x, x) != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    out = set()
    for (u, v), w in sorted(weighted.items(), key=lambda kv: (-kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            par[ru] = rv
            out.add((u, v, w))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=random_graph(), seed=st.integers(min_value=0, max_value=10**6))
def test_max_spanning_forest_matches_kruskal(sess, pairs, seed):
    import hashlib

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        max_spanning_forest,
    )

    if not pairs:
        return
    # Deterministic pseudo-random weights 1..5 (duplicates likely —
    # exercises the (w, src, dst) tie-break).
    weighted = {
        (u, v): 1 + int(hashlib.md5(f"{seed}:{u}:{v}".encode()).hexdigest(), 16) % 5
        for u, v in pairs
    }
    df = sess.createDataFrame(
        [(u, v, w) for (u, v), w in weighted.items()], "src long, dst long, cnt long"
    )
    got = {(r.src, r.dst, r.cnt) for r in max_spanning_forest(df).collect()}
    assert got == python_kruskal_max(weighted)


# --- multimodal byte parsers (pure Python, no Spark session needed) ---

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (  # noqa: E402
    _gif_bytes,
    _jpeg_bytes,
    _png_bytes,
    _wav_bytes,
    audio_meta,
    image_dims,
)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=2**31 - 1),
    h=st.integers(min_value=1, max_value=2**31 - 1),
)
def test_png_dims_roundtrip(w, h):
    assert image_dims(_png_bytes(w, h)) == (w, h)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
    fmt=st.sampled_from(["gif", "jpeg"]),
)
def test_gif_jpeg_dims_roundtrip(w, h, fmt):
    build = _gif_bytes if fmt == "gif" else _jpeg_bytes
    assert image_dims(build(w, h)) == (w, h)


@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=384_000),
    channels=st.integers(min_value=1, max_value=16),
    frames=st.integers(min_value=0, max_value=100_000),
)
def test_wav_meta_roundtrip(rate, channels, frames):
    assert audio_meta(_wav_bytes(rate, channels, frames)) == (
        rate,
        channels,
        frames * 1000 // rate,
    )


@settings(max_examples=50, deadline=None)
@given(data=st.binary(max_size=200))
def test_parsers_never_raise_on_garbage(data):
    image_dims(data)  # may return None or a (w, h); must not raise
    audio_meta(data)


# --- interval join vs brute force ---

@st.composite
def events_and_intervals(draw):
    n_ev = draw(st.integers(min_value=1, max_value=15))
    n_iv = draw(st.integers(min_value=1, max_value=6))
    evs = [
        (i, draw(st.integers(min_value=0, max_value=72)) * 600)  # 10-min grid, 12h span
        for i in range(n_ev)
    ]
    ivs = []
    for j in range(n_iv):
        s = draw(st.integers(min_value=0, max_value=72)) * 600
        length = draw(st.integers(min_value=0, max_value=18)) * 600
        ivs.append((100 + j, s, s + length))
    return evs, ivs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=events_and_intervals())
def test_interval_join_matches_brute_force(sess, data):
    import datetime

    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        interval_join,
    )

    evs, ivs = data
    t0 = datetime.datetime(2026, 3, 1)
    sec = lambda s: t0 + datetime.timedelta(seconds=s)
    events = sess.createDataFrame(
        [(i, sec(s)) for i, s in evs], "event_id long, ts timestamp_ntz"
    )
    intervals = sess.createDataFrame(
        [(j, sec(a), sec(b)) for j, a, b in ivs],
        "iv_id long, start timestamp_ntz, end timestamp_ntz",
    )
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(events, intervals, granularity="hour").collect()
    }
    want = {(i, j) for i, s in evs for j, a, b in ivs if a <= s < b}
    assert got == want


# --- probe-chaining invariance (sssp / kcore probe_every) ---

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (  # noqa: E402
    sssp,
)


def python_sssp(weighted_pairs, source):
    import heapq

    adj = {}
    for u, v, w in weighted_pairs:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {source: 0}
    heap = [(0, source)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


@st.composite
def random_weighted_graph(draw):
    pairs = draw(random_graph())
    ws = draw(
        st.lists(
            st.integers(min_value=1, max_value=9),
            min_size=len(pairs),
            max_size=len(pairs),
        )
    )
    return [(u, v, w) for (u, v), w in zip(pairs, ws)]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wp=random_weighted_graph(), pe=st.integers(min_value=1, max_value=4))
def test_sssp_probe_chaining_matches_dijkstra(sess, wp, pe):
    # Any probe_every must reach the same unique fixpoint (relaxing a
    # converged frontier is a no-op), and that fixpoint is Dijkstra's.
    if not wp:
        return
    sym = [(u, v, w) for u, v, w in wp] + [(v, u, w) for u, v, w in wp]
    df = sess.createDataFrame(sym, "src long, dst long, w long")
    source = min(u for u, _, _ in sym)
    got = {r.vertex: r.dist for r in sssp(df, source, probe_every=pe).collect()}
    assert got == python_sssp(wp, source)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=random_graph(), pe=st.integers(min_value=1, max_value=3))
def test_kcore_probe_chaining_matches_python_oracle(sess, pairs, pe):
    if not pairs:
        return
    df = sess.createDataFrame(pairs, "src long, dst long")
    got = {r.vertex: r.core_degree for r in kcore(df, 2, probe_every=pe).collect()}
    assert got == python_kcore(pairs, 2)


# --- exact prefix-filtered similarity join vs brute force ---

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dedup import (  # noqa: E402
    prefix_jaccard_join,
)


def _brute_jaccard_pairs(docs, t_num, t_den):
    """All-pairs token-Jaccard >= t over normalized text, in python."""
    import itertools
    import re

    sets = {}
    for i, text in docs:
        toks = set(re.sub(r"[^a-z0-9]+", " ", text.lower()).split())
        toks.discard("")
        if toks:
            sets[i] = toks
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if t_den * inter >= t_num * union:
            out.add((a, b, inter, len(sets[a]), len(sets[b])))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=24),
        min_size=2,
        max_size=12,
    ),
    t=st.sampled_from([(1, 2), (4, 5), (9, 10)]),
)
def test_prefix_join_exact_vs_brute_force(sess, docs, t):
    """The prefix filter must be EXACT: same pair set as all-pairs
    comparison, at several thresholds, over adversarially tiny token
    vocabularies (maximal prefix collisions)."""
    t_num, t_den = t
    rows = [(i, text) for i, text in enumerate(docs)]
    df = sess.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.inter, r.n_a, r.n_b)
        for r in prefix_jaccard_join(
            df, threshold_num=t_num, threshold_den=t_den
        ).collect()
    }
    assert got == _brute_jaccard_pairs(rows, t_num, t_den)


# ---------------------------------------------------------------------------
# Round-6 third-session properties: modularity and winsorization against
# pure-python oracles on random inputs.


@st.composite
def random_partitioned_graph(draw):
    """Random simple graph on 3..9 vertices with a random vertex
    partition — exercises positive, zero, and negative modularity."""
    n = draw(st.integers(min_value=3, max_value=9))
    all_pairs = [(u, v) for u in range(1, n + 1) for v in range(u + 1, n + 1)]
    edges = [p for p in all_pairs if draw(st.booleans())]
    if not edges:
        edges = [all_pairs[0]]
    labels = {v: draw(st.integers(min_value=0, max_value=2)) for v in range(1, n + 1)}
    return edges, labels


def python_modularity_ppm(edges, labels):
    m = len(edges)
    e_c = sum(1 for u, v in edges if labels[u] == labels[v])
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    d_c = {}
    for v, d in deg.items():
        d_c[labels[v]] = d_c.get(labels[v], 0) + d
    sum_dc2 = sum(d * d for d in d_c.values())
    num = 4 * m * e_c - sum_dc2
    den = 4 * m * m
    # Spark DIV truncates toward zero; python // floors — align signs.
    q = (num * 1_000_000) // den if num >= 0 else -((-num * 1_000_000) // den)
    n_comms = len({labels[v] for v in deg})
    return n_comms, m, q


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(g=random_partitioned_graph())
def test_modularity_matches_python_oracle(sess, g):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        modularity_summary,
    )

    edges, labels = g
    edf = sess.createDataFrame(edges, "src long, dst long")
    ldf = sess.createDataFrame(list(labels.items()), "vertex long, component long")
    [r] = modularity_summary(edf, ldf).collect()
    assert (r["n_communities"], r["m_edges"], r["q_ppm"]) == python_modularity_ppm(
        edges, labels
    )
    assert -1_000_000 <= r["q_ppm"] < 1_000_000  # Q in [-1, 1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    prices=st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=3, max_size=40
    )
)
def test_winsorized_spend_matches_python_oracle(sess, prices):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        winsorized_spend,
    )

    orders = sess.createDataFrame(
        [(i, c / 100.0) for i, c in enumerate(prices)],
        "o_orderkey long, o_totalprice double",
    )
    n = len(prices)
    ordered = sorted(prices)
    p_lo = ordered[(5 * n + 99) // 100 - 1]
    p_hi = ordered[(95 * n + 99) // 100 - 1]
    [r] = winsorized_spend(orders).collect()
    assert (r["n_orders"], r["p_lo_cents"], r["p_hi_cents"]) == (n, p_lo, p_hi)
    assert r["n_clipped_low"] == sum(1 for c in prices if c < p_lo)
    assert r["n_clipped_high"] == sum(1 for c in prices if c > p_hi)
    assert r["winsorized_sum_cents"] == sum(min(max(c, p_lo), p_hi) for c in prices)


@settings(max_examples=25, deadline=None)
@given(
    n_frames=st.integers(min_value=1, max_value=4),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_gif_codec_roundtrips_random_frames(n_frames, w, h, seed):
    """Round-9 GIF codec: encode/decode round-trips ANY uint8 frame
    stack bit-exactly (GIF is lossless), across LZW width growth and
    the 4096 dictionary reset; truncation raises ValueError; and a
    hand-flipped interlace bit de-interlaces (round 11 made the flag
    real): the decoder scatters the sequentially-stored rows through
    the 4-pass order, so the result is exactly that permutation."""
    import numpy as np
    import pytest

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        _gif_interlace_order,
        gif_decode_frames,
        gif_encode_frames,
        image_dims,
    )

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w)) for _ in range(n_frames)]
    enc = gif_encode_frames(frames)
    dec = gif_decode_frames(enc)
    assert len(dec) == n_frames
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)
    assert image_dims(enc) == (w, h)

    with pytest.raises(ValueError):
        gif_decode_frames(enc[: len(enc) // 2])
    with pytest.raises(ValueError):
        gif_decode_frames(b"GIF89a" + enc[6:10])
    # flip the interlace bit of the first image descriptor (fixed
    # structural offset: 13 header + 768 palette + 19 NETSCAPE + 8 GCE)
    idx = 13 + 768 + 19 + 8
    assert enc[idx] == 0x2C
    flipped = enc[: idx + 9] + bytes([enc[idx + 9] | 0x40]) + enc[idx + 10 :]
    dec_flipped = gif_decode_frames(flipped)
    expected = np.empty_like(frames[0])
    expected[np.asarray(_gif_interlace_order(h))] = frames[0]
    assert np.array_equal(dec_flipped[0], expected)
