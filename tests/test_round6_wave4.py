"""Round-6 fourth-wave operators: deterministic random-walk corpus
generation (structure + python md5 replay), SQ8 scalar-quantized
top-k (bounds/codes/score replay), per-customer z-score spend
outliers, and the OLS revenue trend — the pytest layer under their
SQL oracles, plus physical-plan pins for the new query surface."""

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F

from conftest import make_edges

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
    random_walks,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
    revenue_trend,
    spend_outliers,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.similarity import (
    sq8_params,
    sq8_topk,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------ random walks

WALK_G = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]  # cycle + chord


def _py_walks(pairs, walk_len, salt="walk"):
    """Pure-python replay of random_walks' md5 pick."""
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    out = set()
    for start in adj:
        cur = start
        out.add((start, 0, start))
        for t in range(1, walk_len + 1):
            h = hashlib.md5(f"{salt}:{start}:{t}:{cur}".encode()).hexdigest()
            idx = int(h[:8], 16) % len(adj[cur])
            cur = adj[cur][idx]
            out.add((start, t, cur))
    return out


def test_random_walks_matches_python_replay(spark):
    walks = random_walks(make_edges(spark, WALK_G), walk_len=4)
    got = {(r["walk_id"], r["step"], r["vertex"]) for r in walks.collect()}
    assert got == _py_walks(WALK_G, 4)


def test_random_walks_shape_and_edge_validity(spark):
    edges = make_edges(spark, WALK_G)
    walks = random_walks(edges, walk_len=3)
    rows = walks.collect()
    # exactly V*(len+1) rows: every vertex starts one walk, no walk dies
    assert len(rows) == 4 * 4
    assert len({(r["walk_id"], r["step"]) for r in rows}) == len(rows)
    # every transition is a real edge
    eset = {(u, v) for u, v in WALK_G} | {(v, u) for u, v in WALK_G}
    byw = {}
    for r in rows:
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    for w, steps in byw.items():
        assert steps[0] == w
        for t in range(1, 4):
            assert (steps[t - 1], steps[t]) in eset
    # deterministic: a second build is row-identical
    again = {(r["walk_id"], r["step"], r["vertex"]) for r in
             random_walks(edges, walk_len=3).collect()}
    assert again == {(r["walk_id"], r["step"], r["vertex"]) for r in rows}


# --------------------------------------------------------------- SQ8

SQ8_VECS = [
    (0, [1.0, 0.0, 5.0, -2.0]),
    (1, [0.5, 0.0, 4.0, -1.0]),
    (2, [-1.0, 0.0, 0.0, 2.0]),
    (3, [2.0, 0.0, 5.0, -2.0]),
    (4, [0.0, 0.0, 2.5, 0.0]),
]


def _mk_emb(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in SQ8_VECS],
        "vec_id long, embedding array<float>",
    )


def _py_sq8(vecs, levels=255):
    dim = len(vecs[0][1])
    mns = [min(v[d] for _, v in vecs) for d in range(dim)]
    mxs = [max(v[d] for _, v in vecs) for d in range(dim)]

    def code(v):
        out = []
        for d in range(dim):
            r = mxs[d] - mns[d]
            if r == 0.0:
                out.append(0)
            else:
                out.append(min(levels, max(0, math.floor((v[d] - mns[d]) * levels / r))))
        return out

    return mns, mxs, {i: code(v) for i, v in vecs}


def test_sq8_params_are_per_dimension_min_max(spark):
    mns, mxs = sq8_params(_mk_emb(spark))
    exp_mn, exp_mx, _ = _py_sq8(SQ8_VECS)
    assert mns == exp_mn and mxs == exp_mx


def test_sq8_topk_scores_match_integer_replay(spark):
    emb = _mk_emb(spark)
    qvec = SQ8_VECS[0][1]
    got = {r["vec_id"]: r["score"] for r in sq8_topk(emb, qvec, 5).collect()}
    _, _, codes = _py_sq8(SQ8_VECS)
    qc = codes[0]  # query is vector 0, coded with the same bounds
    exp = {i: sum(a * b for a, b in zip(codes[i], qc)) for i, _ in SQ8_VECS}
    assert got == exp
    # degenerate constant dimension codes to 0 everywhere (dim 1)
    assert all(c[1] == 0 for c in codes.values())


def test_sq8_rank_ordering_and_tiebreak(spark):
    emb = _mk_emb(spark)
    rows = sq8_topk(emb, SQ8_VECS[0][1], 5).orderBy("rank").collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for a, b in zip(rows, rows[1:]):
        if a["score"] == b["score"]:
            assert a["vec_id"] < b["vec_id"]


# ---------------------------------------------------------- outliers

def test_spend_outliers_flag_is_exact_integer_inequality(spark):
    # customer 1: five 100.00 orders and one 900.00 spike -> spike flagged;
    # customer 2: six identical orders -> zero variance, nothing flagged;
    # customer 3: only two orders -> below min_orders even with a spike.
    rows = (
        [(1, k, 100.0) for k in range(1, 6)]
        + [(1, 6, 900.0)]
        + [(2, k, 50.0) for k in range(10, 16)]
        + [(3, 20, 10.0), (3, 21, 99999.0)]
    )
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_totalprice double"
    )
    got = spend_outliers(orders, min_orders=5, z_threshold=2).collect()
    assert {(r["o_custkey"], r["o_orderkey"]) for r in got} == {(1, 6)}
    (r,) = got
    n, s = 6, 6 * 10000 + 80000  # cents: 5x10000 + 90000
    ss = 5 * 10000**2 + 90000**2
    num, den = n * 90000 - s, n * ss - s * s
    assert r["n_orders"] == 6 and r["cents"] == 90000
    assert r["z"] == round(num / math.sqrt(den), 4)


# ------------------------------------------------------------- trend

def test_revenue_trend_recovers_exact_line(spark):
    # daily revenue exactly 1000 + 7*x cents on days x = 0..9
    rows = [
        (x, float((1000 + 7 * x) / 100.0), f"1992-01-{x + 1:02d}")
        for x in range(10)
    ]
    orders = spark.createDataFrame(
        [(k, p, d) for k, p, d in rows],
        "o_orderkey long, o_totalprice double, o_orderdate string",
    ).select("o_orderkey", "o_totalprice", F.col("o_orderdate").cast("timestamp").alias("o_orderdate"))
    (r,) = revenue_trend(orders).collect()
    assert r["n_days"] == 10
    assert r["slope_ppm_cents_per_day"] == 7 * 10**6
    assert r["intercept_cents"] == 1000


# ----------------------------------------------------------- plan pins

@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_wave4_plans_have_no_antipatterns(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("q_walks", "q_sq8_topk", "q_outliers", "q_trend"):
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name  # no row-at-a-time UDFs
    # SQ8 scoring is pure JVM codegen (transform/aggregate over literal
    # bound arrays) and its top-k is partial, never a global sort.
    plan = qs["q_sq8_topk"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan


# --------------------------------------------- neighbor sampling

def test_neighbor_sample_caps_and_replays(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        neighbor_sample,
    )

    star = [(1, i) for i in range(2, 9)] + [(2, 3)]  # hub 1 (deg 7)
    got = neighbor_sample(make_edges(spark, star), k=3).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append((r["sample_rank"], r["dst"]))
    # hub capped at k, low-degree vertices keep their full list
    assert len(by_src[1]) == 3
    assert len(by_src[4]) == 1
    for src, lst in by_src.items():
        assert sorted(rk for rk, _ in lst) == list(range(1, len(lst) + 1))
    # python replay of the md5 priority order
    adj = {}
    for u, v in star:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for src, lst in by_src.items():
        exp = sorted(
            adj[src],
            key=lambda d: (hashlib.md5(f"nbr:{src}:{d}".encode()).hexdigest(), d),
        )[:3]
        assert [d for _, d in sorted(lst)] == exp


# ------------------------------------------- feature propagation

def test_feature_propagation_matches_hand_sums(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
        feature_propagation,
    )

    path = [(1, 2), (2, 3)]  # 1-2-3
    feats = spark.createDataFrame(
        [(1, 10), (2, 100)], "vertex long, feat long"  # vertex 3 missing -> 0
    )
    got = {
        r["vertex"]: (r["degree"], r["h1"], r["h2"])
        for r in feature_propagation(make_edges(spark, path), feats, hops=2).collect()
    }
    # h1: sums of neighbor h0 (missing features contribute 0)
    # h2: sums of neighbor h1 (walks WITH backtracking: A^2 x)
    assert got[1] == (1, 100, 10)      # h2(1) = h1(2) = 10+0
    assert got[2] == (2, 10, 200)      # h1(2) = 10+0; h2(2) = h1(1)+h1(3) = 100+100
    assert got[3] == (1, 100, 10)
    assert set(got) == {1, 2, 3}


# ------------------------------------------------- grouped split

def test_grouped_split_never_straddles_groups(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sampling import (
        grouped_split_summary,
        train_split,
    )

    rows = [(i, f"src{i % 7}", 10 * i) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    assigned = train_split(df, id_col="source", salt="gsplit")
    per_group = (
        assigned.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_group)  # leakage-safe by construction
    summary = {
        r["split"]: (r["n_groups"], r["n_rows"], r["total_weight"])
        for r in grouped_split_summary(
            df, group_col="source", salt="gsplit", weight_col="n_chars"
        ).collect()
    }
    assert sum(g for g, _, _ in summary.values()) == 7
    assert sum(n for _, n, _ in summary.values()) == 200
    assert sum(w for _, _, w in summary.values()) == sum(10 * i for i in range(200))
