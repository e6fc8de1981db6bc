"""Round-6 second-wave operators: directed SCC (property vs pure-python
reachability), MVCC snapshot_versions semantics, levenshtein fuzzy
dedup blocking, CUBE grains, blocked global rank/deciles, 3-event
motifs, the foreachBatch upsert view's arrival-split invariance, and
audio decimation — the pytest layer under their SQL oracles."""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sess(spark):
    return spark


# ---------------------------------------------------------------- SCC

@st.composite
def random_digraph(draw):
    """Random directed graph on 2..8 vertices, ~2n arcs, self-loops
    excluded (trade_digraph never emits them)."""
    n = draw(st.integers(min_value=2, max_value=8))
    m = draw(st.integers(min_value=1, max_value=2 * n))
    arcs = set()
    for _ in range(m):
        a = draw(st.integers(min_value=1, max_value=n))
        b = draw(st.integers(min_value=1, max_value=n))
        if a != b:
            arcs.add((a, b))
    return sorted(arcs)


def python_scc(arcs):
    """scc(v) = min over {w : v ->* w and w ->* v} ∪ {v}, via
    transitive closure (tiny graphs)."""
    verts = sorted({x for e in arcs for x in e})
    reach = {v: {v} for v in verts}
    changed = True
    while changed:
        changed = False
        for a, b in arcs:
            new = reach[b] - reach[a]
            if new:
                reach[a] |= new
                changed = True
    return {
        v: min([w for w in reach[v] if v in reach[w]] + [v]) for v in verts
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(arcs=random_digraph())
def test_scc_matches_python_reachability(sess, arcs):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        strongly_connected_components,
    )

    if not arcs:
        return
    df = sess.createDataFrame(arcs, "src long, dst long")
    got = {r.vertex: r.scc for r in strongly_connected_components(df).collect()}
    assert got == python_scc(arcs)


def test_scc_id_descending_chain_needs_peels(sess):
    # The adversarial shape from the docstring: 4 -> 3 -> 2 -> 1 pins
    # one singleton SCC per peel round; exhaustion must RAISE, not
    # return partial labels.
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        strongly_connected_components,
    )

    chain = sess.createDataFrame(
        [(4, 3), (3, 2), (2, 1)], "src long, dst long"
    )
    got = {
        r.vertex: r.scc
        for r in strongly_connected_components(chain).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}
    with pytest.raises(RuntimeError, match="peel"):
        strongly_connected_components(chain, max_peel_rounds=2)


def test_scc_probe_chaining_same_fixpoint(sess):
    # Round-7: min-label propagation is monotone, so probing every k
    # rounds must land on the SAME fixpoint for any k (the sssp
    # probe_every contract, extended to the SCC peel loop).  Two
    # 3-cycles bridged one way + a tail — multi-SCC, multi-depth.
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        strongly_connected_components,
    )

    arcs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    df = sess.createDataFrame(arcs, "src long, dst long")
    base = {
        r.vertex: r.scc
        for r in strongly_connected_components(df, probe_every=1).collect()
    }
    for pe in (2, 3, 7):
        got = {
            r.vertex: r.scc
            for r in strongly_connected_components(df, probe_every=pe).collect()
        }
        assert got == base, pe


# ------------------------------------------------- MVCC snapshot log

def test_snapshot_versions_delete_then_insert_nets_to_present(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.catalog import (
        snapshot_versions,
    )

    base = sess.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    # v2: delete (1,2) AND insert (2,1) — same canonical edge, must
    # stay present (merge_edges: deletes first); also delete (2,3).
    ins = sess.createDataFrame([(2, 1)], "src long, dst long")
    dels = sess.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {
        r.version: (r.n_edges, r.checksum)
        for r in snapshot_versions(base, [(ins, dels)], graph_id=7).collect()
    }
    p = 100003
    assert out[1] == (2, (1 * p + 2) + (2 * p + 3))
    assert out[2] == (1, 1 * p + 2)


# ------------------------------------------------ levenshtein dedup

def test_edit_dedup_finds_planted_pair_and_caps_boilerplate(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dedup import (
        edit_dedup,
    )

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, body),
        (1, body.replace("theta", "thexa")),  # 1 substitution
        (2, "totally different words entirely here now yes indeed ok fine"),
    ]
    # 20 boilerplate docs sharing one gram vocabulary: bucket cap 16
    # must drop their grams, so no pair among them survives blocking.
    boiler = [(100 + i, "one two three four five six seven") for i in range(20)]
    docs = sess.createDataFrame(rows + boiler, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.lev for r in edit_dedup(docs).collect()
    }
    assert got == {(0, 1): 1}


# --------------------------------------------------------- CUBE/rank

def test_order_cube_grains_reconcile(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        order_cube,
    )

    orders = sess.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    cube = order_cube(orders).collect()
    gids = {r.gid for r in cube}
    assert gids == {0, 1, 2, 3}
    grand = [r for r in cube if r.gid == 3]
    assert len(grand) == 1
    total = sum(r.n_orders for r in cube if r.gid == 0)
    assert grand[0].n_orders == total == orders.count()
    # per-priority marginals (o_year nulled => gid bit 0 set => gid 1)
    pri = {r.priority: r.n_orders for r in cube if r.gid == 1}
    assert sum(pri.values()) == total


def test_blocked_global_rank_equals_single_window(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        blocked_global_rank,
    )

    rows = [(i, (i * 37) % 11) for i in range(1, 41)]  # heavy ties
    df = sess.createDataFrame(rows, "o_custkey long, cents long")
    got = {
        r.o_custkey: r.i
        for r in blocked_global_rank(df, "cents", "o_custkey").collect()
    }
    expect = {
        k: rank + 1
        for rank, (k, _) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0]))
        )
    }
    assert got == expect


def test_decile_table_counts_balanced(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        decile_table,
    )

    orders = sess.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    out = {r.decile: r for r in decile_table(orders).collect()}
    n = sum(r.n_customers for r in out.values())
    assert set(out) == set(range(10))
    # equal-count cut: bucket sizes differ by at most 1
    sizes = [out[d].n_customers for d in range(10)]
    assert max(sizes) - min(sizes) <= 1
    # buckets are value-ordered: max of d <= min of d+1
    for d in range(9):
        assert out[d].max_cents <= out[d + 1].min_cents
    assert n == orders.select("o_custkey").distinct().count()


# ------------------------------------------------------ event motifs

def test_event_sequences_tiebreak_and_counts(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        event_sequences,
    )

    # user 1: same-ts events 2/3 ordered by event_id -> a,b,c and b,c,d
    rows = [
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:00:01", "b"),
        (3, 1, "2024-01-01 00:00:01", "c"),
        (4, 1, "2024-01-01 00:00:02", "d"),
        (5, 2, "2024-01-01 00:00:00", "a"),
        (6, 2, "2024-01-01 00:00:01", "b"),
    ]
    ev = sess.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.e1, r.e2, r.e3): (r.cnt, r.support_ppm)
        for r in event_sequences(ev).collect()
    }
    assert got == {("a", "b", "c"): (1, 500000), ("b", "c", "d"): (1, 500000)}


# --------------------------------------------------- streaming upsert

def test_spend_upsert_split_invariant(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.streaming.ingest import (
        run_spend_upsert_batch,
    )

    path = os.path.join(SF_DIR, "events.parquet")
    batch = (
        sess.read.parquet(path)
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "spend_cents"
            ),
            F.count("*").alias("n_purchases"),
        )
    )
    expect = {
        r.user_id: (r.spend_cents, r.n_purchases) for r in batch.collect()
    }
    for n_files in (1, 4):
        got = {
            r.user_id: (r.spend_cents, r.n_purchases)
            for r in run_spend_upsert_batch(
                sess, path, n_files=n_files
            ).collect()
        }
        assert got == expect, f"n_files={n_files}"


# ------------------------------------------------- audio decimation

def test_audio_downsample_matches_python_replay(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
        audio_downsample_features,
        plant_audio_signal,
    )

    docs = sess.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    media = plant_audio_signal(docs)
    got = {r.media_id: r for r in audio_downsample_features(media).collect()}
    for i in range(6):
        rate = 8000 + (i % 5) * 4000
        ch = 1 + i % 2
        frames = 100 + (37 * i) % 900
        kept = [
            ((37 * k + 11 * i) % 4001) - 2000
            for k in range(frames * ch)
            if (k // ch) % 2 == 0
        ]
        r = got[i]
        assert r.rate_out == rate // 2
        assert r.n_samples == len(kept)
        assert r.peak == max(abs(v) for v in kept)
        assert r.sum_abs == sum(abs(v) for v in kept)
        assert r.sum_sq == sum(v * v for v in kept)


def test_snapshot_diff_cancels_intermediate_churn(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.catalog import (
        snapshot_diff,
    )

    base = sess.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    # v2 inserts (3,4) and deletes (1,2); v3 deletes (3,4) again and
    # re-inserts (1,2): the v1 -> v3 diff must be EMPTY.
    i2 = sess.createDataFrame([(3, 4)], "src long, dst long")
    d2 = sess.createDataFrame([(1, 2)], "src long, dst long")
    i3 = sess.createDataFrame([(1, 2)], "src long, dst long")
    d3 = sess.createDataFrame([(3, 4)], "src long, dst long")
    deltas = [(i2, d2), (i3, d3)]
    assert snapshot_diff(
        base, deltas, v_from=1, v_to=3, graph_id=1
    ).count() == 0
    mid = {
        (r.op, r.lo, r.hi)
        for r in snapshot_diff(
            base, deltas, v_from=1, v_to=2, graph_id=1
        ).collect()
    }
    assert mid == {("add", 3, 4), ("del", 1, 2)}


def test_assortativity_matches_python_replay(sess):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        degree_assortativity,
    )

    # star (disassortative, r < 0) plus a detached triangle.
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (6, 7), (7, 8), (6, 8)]
    sym = pairs + [(b, a) for a, b in pairs]
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    m = len(sym)
    sjk = sum(deg[a] * deg[b] for a, b in sym)
    sj = sum(deg[a] for a, _ in sym)
    sjj = sum(deg[a] ** 2 for a, _ in sym)
    num, den = m * sjk - sj * sj, m * sjj - sj * sj
    df = sess.createDataFrame(pairs, "src long, dst long")
    row = degree_assortativity(df).collect()[0]
    assert (row.m_directed, row.num, row.den) == (m, num, den)
    assert row.num < 0  # the star drives r negative
    assert row.r_ppm == -((-num * 10**6) // den)
