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
