"""Round-6 eighth-wave operators: language-ID confusion matrix,
delta-log vacuum/compaction planning, and the customer-side bipartite
projection (co-buyer CF) — the pytest layer under their SQL oracles."""

from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.catalog import (
    vacuum_plan,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
    also_bought,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.textops import (
    lang_confusion,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.graphs import (
    cooccurrence_pairs,
)


# ------------------------------------------------------ lang_confusion


def test_lang_confusion_diagonal_and_miss_cells(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat of note", "en"),     # en markers -> en (diagonal)
            (2, "der hund und die", "de"),    # de markers -> de (diagonal)
            (3, "xyz qqq", "zh"),             # no markers -> und
            (4, "le chat et la nuit", "en"),  # fr markers, en label -> off-diagonal
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["lang"], r["lang_guess"]): r["n_docs"]
        for r in lang_confusion(docs).collect()
    }
    assert got == {
        ("en", "en"): 1,
        ("de", "de"): 1,
        ("zh", "und"): 1,
        ("en", "fr"): 1,
    }


# --------------------------------------------------------- vacuum_plan


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_vacuum_plan_counts_survivors_and_reclaimables(spark):
    # v1 inserts {12, 13}; v2 deletes 12 and inserts 14;
    # v3 inserts 15.  Horizon 2:
    #   v1: 2 events, edge 13's deciding insert survives -> 1 live, 1 reclaimable
    #   v2: 2 events, 14's insert survives; 12's tombstone is dead -> 1 live, 1 reclaimable
    #   v3: beyond horizon -> log kept verbatim, 0 reclaimable
    base = _pairs(spark, [(1, 2), (1, 3)])
    deltas = [
        (_pairs(spark, [(1, 4)]), _pairs(spark, [(1, 2)])),
        (_pairs(spark, [(1, 5)]), None),
    ]
    got = {
        r["version"]: (r["n_events"], r["n_live_at_horizon"], r["n_reclaimable"])
        for r in vacuum_plan(base, deltas, horizon=2).collect()
    }
    assert got == {1: (2, 1, 1), 2: (2, 1, 1), 3: (1, 0, 0)}


def test_vacuum_plan_full_horizon_reclaims_only_shadowed(spark):
    # Re-insert after delete: both the delete and the first insert are
    # shadowed by the final insert — 2 reclaimable at v<=3, 1 survivor.
    base = _pairs(spark, [(1, 2)])
    deltas = [
        (None, _pairs(spark, [(1, 2)])),
        (_pairs(spark, [(1, 2)]), None),
    ]
    got = {
        r["version"]: (r["n_events"], r["n_live_at_horizon"], r["n_reclaimable"])
        for r in vacuum_plan(base, deltas, horizon=3).collect()
    }
    assert got == {1: (1, 0, 1), 2: (1, 0, 1), 3: (1, 1, 0)}


# ----------------------------------------------------- co-buyer pairs


def test_cobuyer_projection_counts_shared_groups(spark):
    # Parts as groups: part 7 bought by customers {1,2}, part 8 by
    # {1,2,3}, part 9 by {1} -> pair (1,2) shares 2 parts.
    bought = spark.createDataFrame(
        [(7, 1), (7, 2), (8, 1), (8, 2), (8, 3), (9, 1)],
        "l_partkey long, o_custkey long",
    )
    pairs = cooccurrence_pairs(bought, "l_partkey", "o_custkey", max_group=12)
    w = pairs.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    got = {(r["src"], r["dst"]): r["cnt"] for r in w.collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    wsym = w.unionAll(
        w.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "cnt")
    )
    top = {
        (r["src"], r["rank"]): r["dst"]
        for r in also_bought(wsym, k=1).collect()
    }
    # Everyone's best co-buyer: strongest tie wins, dst asc on ties.
    assert top == {(1, 1): 2, (2, 1): 1, (3, 1): 1}


def test_cobuyer_staple_cap_drops_group_before_explosion(spark):
    bought = spark.createDataFrame(
        [(7, c) for c in range(1, 6)] + [(8, 1), (8, 2)],
        "l_partkey long, o_custkey long",
    )
    pairs = cooccurrence_pairs(bought, "l_partkey", "o_custkey", max_group=3)
    assert {(r["src"], r["dst"]) for r in pairs.collect()} == {(1, 2)}


# ----------------------------------------------- quintile mobility


def test_quintile_mobility_tracks_rank_moves(spark):
    import datetime

    # 5 customers active both years, one per quintile; customer 5
    # crashes from top to bottom in year 2, everyone else shifts up
    # one bucket; customer 9 is active only in year 1 (excluded).
    rows = []
    for i, cents in enumerate([10.0, 20.0, 30.0, 40.0, 50.0], start=1):
        rows.append((i, cents, datetime.datetime(1995, 6, 1)))
    y2 = {1: 20.0, 2: 30.0, 3: 40.0, 4: 50.0, 5: 1.0}
    for i, cents in y2.items():
        rows.append((i, cents, datetime.datetime(1996, 6, 1)))
    rows.append((9, 99.0, datetime.datetime(1995, 7, 1)))
    orders = spark.createDataFrame(
        [(j, r[0], r[1], r[2]) for j, r in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        quintile_mobility,
    )

    got = {
        (r["q_from"], r["q_to"]): r["n_customers"]
        for r in quintile_mobility(orders).collect()
    }
    # y1 spends: c1=10<c2=20<c3=30<c4=40<c5=50<c9=99 (6 customers,
    # buckets (i-1)*5 DIV 6 -> 0,0,1,2,3,4).
    # y2 spends: c5=1<c1=20<c2=30<c3=40<c4=50 (5 customers ->
    # buckets 0,1,2,3,4).
    assert got == {
        (0, 1): 1,  # c1
        (0, 2): 1,  # c2
        (1, 3): 1,  # c3
        (2, 4): 1,  # c4
        (3, 0): 1,  # c5 crash
    }


def test_seasonal_index_sums_to_twelve_million_ppm(spark):
    import datetime

    # Two months, 3:1 revenue split; idx = month share * 12 * 1e6 /
    # total: m1 = 75% -> 9_000_000 ppm; m2 = 25% -> 3_000_000 ppm.
    orders = spark.createDataFrame(
        [
            (1, 30.0, datetime.datetime(1995, 1, 5)),
            (2, 45.0, datetime.datetime(1995, 1, 20)),
            (3, 25.0, datetime.datetime(1995, 2, 5)),
        ],
        "o_orderkey long, o_totalprice double, o_orderdate timestamp",
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        seasonal_index,
    )

    got = {r["month"]: (r["total_cents"], r["idx_ppm"]) for r in seasonal_index(orders).collect()}
    assert got == {1: (7500, 9_000_000), 2: (2500, 3_000_000)}
