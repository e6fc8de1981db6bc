"""Round-6 fifth-wave operators: item-based CF readout (also_bought),
referential-integrity audit, per-type adoption curves, and
inverted-index-blocked one-vs-corpus Jaccard retrieval — the pytest
layer under their SQL oracles."""

import datetime

from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
    also_bought,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
    integrity_audit,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
    cumulative_new_users,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.textops import (
    similar_docs_jaccard,
)


# ------------------------------------------------------- also_bought


def test_also_bought_ranks_by_count_then_dst(spark):
    # src 1 has four neighbors: counts 9,9,5,1 -> top-3 keeps the two
    # 9s (tie broken by dst asc) then the 5; the count-1 edge is cut.
    rows = [
        (1, 4, 9), (1, 2, 9), (1, 3, 5), (1, 5, 1),
        (2, 1, 9),
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, cnt long")
    got = {
        (r["src"], r["rank"]): (r["dst"], r["cnt"])
        for r in also_bought(edges, k=3).collect()
    }
    assert got == {
        (1, 1): (2, 9),
        (1, 2): (4, 9),
        (1, 3): (3, 5),
        (2, 1): (1, 9),
    }


def test_also_bought_caps_output_at_k_rows_per_src(spark):
    rows = [(1, d, d) for d in range(2, 12)]
    edges = spark.createDataFrame(rows, "src long, dst long, cnt long")
    out = also_bought(edges, k=3).collect()
    assert len(out) == 3
    assert [r["dst"] for r in sorted(out, key=lambda r: r["rank"])] == [11, 10, 9]


# --------------------------------------------------- integrity_audit


def test_integrity_audit_counts_planted_orphans(spark):
    nation = spark.createDataFrame([(0,), (1,)], "n_nationkey long")
    customer = spark.createDataFrame(
        [(10, 0), (11, 1), (12, 7)], "c_custkey long, c_nationkey long"
    )  # custkey 12 -> nation 7 is an orphan
    supplier = spark.createDataFrame([(20, 0)], "s_suppkey long, s_nationkey long")
    part = spark.createDataFrame([(30,)], "p_partkey long")
    orders = spark.createDataFrame(
        [(40, 10), (41, 99)], "o_orderkey long, o_custkey long"
    )  # order 41 -> customer 99 is an orphan
    lineitem = spark.createDataFrame(
        [(40, 30), (42, 30)], "l_orderkey long, l_partkey long"
    )  # line (42, _) -> order 42 is an orphan; both parts exist
    got = {
        r["relation"]: (r["n_rows"], r["n_orphans"])
        for r in integrity_audit(
            lineitem, orders, customer, supplier, part, nation
        ).collect()
    }
    assert got == {
        "customer.nationkey->nation": (3, 1),
        "lineitem.orderkey->orders": (2, 1),
        "lineitem.partkey->part": (2, 0),
        "orders.custkey->customer": (2, 1),
        "supplier.nationkey->nation": (1, 0),
    }


# --------------------------------------------- cumulative_new_users


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_cumulative_new_users_global_curve(spark):
    # u1 first on d1 (despite later events), u2 on d1, u3 on d3.
    rows = [
        (1, _ts(1, 5), "view"), (1, _ts(2), "click"),
        (2, _ts(1, 9), "view"),
        (3, _ts(3), "view"), (3, _ts(4), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["day"].day: (r["new_users"], r["cume_users"])
        for r in cumulative_new_users(ev).collect()
    }
    assert got == {1: (2, 2), 3: (1, 3)}


def test_cumulative_new_users_per_type_windows_are_independent(spark):
    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "click"),
        (2, _ts(2), "view"), (2, _ts(2), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r["event_type"], r["day"].day): (r["new_users"], r["cume_users"])
        for r in cumulative_new_users(ev, type_col="event_type").collect()
    }
    assert got == {
        ("view", 1): (1, 1),
        ("view", 2): (1, 2),
        ("click", 2): (2, 2),
    }


# ------------------------------------------------ similar_docs_jaccard


def test_similar_docs_jaccard_scores_and_prunes(spark):
    # "the" appears in all 4 docs (df 100% > 50%) and is pruned; the
    # surviving vocab makes doc 1 = {apple, pie}, doc 2 = {apple, tart},
    # doc 3 = {banana, pie}, doc 4 = {cat}.
    docs = spark.createDataFrame(
        [
            (1, "the apple pie"),
            (2, "the apple tart"),
            (3, "the banana pie"),
            (4, "the cat"),
        ],
        "doc_id long, text string",
    )
    out = similar_docs_jaccard(docs, query_doc_id=1, k=10, df_prune_pct=50)
    got = {r["doc_id"]: (r["n_shared"], r["jac_ppm"], r["rank"]) for r in out.collect()}
    # Jaccard vs doc1 {apple,pie}: doc2 1/3, doc3 1/3, doc4 absent.
    assert got == {
        2: (1, 333333, 1),
        3: (1, 333333, 2),
    }
    assert 1 not in got and 4 not in got


def test_similar_docs_jaccard_identical_doc_scores_full(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        "doc_id long, text string",
    )
    out = similar_docs_jaccard(docs, query_doc_id=1, k=5, df_prune_pct=100)
    got = {r["doc_id"]: r["jac_ppm"] for r in out.collect()}
    assert got[2] == 1_000_000
    assert 3 not in got  # zero shared tokens -> not a candidate at all
