"""Round-6 sixth-wave operators: boilerplate-prefix mining, token
length histogram, cross-source mirror matrix, integer chi-square
contingency, LSH-blocked k-NN graph construction, split-leakage audit,
and exact-rational modularity — the pytest layer under their SQL
oracles."""

import datetime

from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dedup import (
    cross_source_duplicates,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.graphalgs import (
    modularity_summary,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
    event_contingency,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sampling import (
    leakage_matrix,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.similarity import (
    lsh_knn_graph,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.textops import (
    boilerplate_prefixes,
    token_length_histogram,
)


# ----------------------------------------------- boilerplate_prefixes


def test_boilerplate_prefixes_counts_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            (1, "Cookie Notice: alpha"),
            (2, "Cookie Notice: beta"),
            (3, "Cookie Notice: gamma"),
            (4, "Terms of service"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = [
        (r["prefix"], r["n_docs"], r["rank"])
        for r in boilerplate_prefixes(docs, n_tokens=2, k=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("cookie notice", 3, 1), ("terms of", 1, 2)]


def test_boilerplate_prefixes_short_docs_keep_what_exists(spark):
    docs = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    [r] = boilerplate_prefixes(docs, n_tokens=8, k=5).collect()
    assert (r["prefix"], r["n_docs"]) == ("solo", 1)


# -------------------------------------------- token_length_histogram


def test_token_length_histogram_power_of_two_buckets(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en"),       # 3 tokens -> bucket 2
            (2, "a b c d", "en"),     # 4 tokens -> bucket 4
            (3, "", "en"),            # 0 tokens -> bucket 0
            (4, "x", "fr"),           # 1 token  -> bucket 1
            (5, "p q r s t u v w x", "fr"),  # 9 tokens -> bucket 8
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["group"], r["bucket"]): (r["n_docs"], r["total_tokens"])
        for r in token_length_histogram(docs).collect()
    }
    assert got == {
        ("en", 2): (1, 3),
        ("en", 4): (1, 4),
        ("en", 0): (1, 0),
        ("fr", 1): (1, 1),
        ("fr", 8): (1, 9),
    }


# ---------------------------------------- cross_source_duplicates


def test_cross_source_duplicates_canonical_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "Same text!", "a"),
            (2, "same TEXT", "b"),   # normalizes identically
            (3, "same text", "c"),
            (4, "unique one", "a"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_fps"]
        for r in cross_source_duplicates(docs).collect()
    }
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


# ------------------------------------------------ event_contingency


def test_event_contingency_integer_ppm_cells(spark):
    # 2024-01-07 is a Sunday (dow 0), 2024-01-08 a Monday (dow 1).
    sun, mon = datetime.datetime(2024, 1, 7), datetime.datetime(2024, 1, 8)
    rows = (
        [("a", sun)] * 10 + [("a", mon)] * 10 + [("b", sun)] * 5 + [("b", mon)] * 15
    )
    ev = spark.createDataFrame(
        [(t, ts, i) for i, (t, ts) in enumerate(rows)],
        "event_type string, ts timestamp, user_id long",
    )
    got = {
        (r["event_type"], r["dow"]): (r["obs"], r["exp_ppm"], r["contrib_ppm"])
        for r in event_contingency(ev).collect()
    }
    # N=40; r_a=r_b=20; c_sun=15, c_mon=25.
    assert got == {
        ("a", 0): (10, 7_500_000, 833_333),
        ("a", 1): (10, 12_500_000, 500_000),
        ("b", 0): (5, 7_500_000, 833_333),
        ("b", 1): (15, 12_500_000, 500_000),
    }


# --------------------------------------------------- lsh_knn_graph


def test_lsh_knn_graph_finds_identical_vectors_both_ways(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),   # identical to 1
            (3, [0.9, 0.1, 0.0, 0.0]),
            (4, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = lsh_knn_graph(emb, k=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["rank"], r["nbr"], r["sim"]))
    # Identical vectors share every bucket (sign-LSH is deterministic
    # on equal inputs) and cosine 1.0 beats every other candidate.
    assert by_id[1][0] == (1, 2, 1.0) or (1, 2, 1.0) in by_id[1]
    assert (1, 1, 1.0) in by_id[2]
    assert all(r["rank"] <= 2 for r in out)


# -------------------------------------------------- leakage_matrix


def test_leakage_matrix_classifies_pairs_by_split(spark):
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    assigned = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "train")],
        "doc_id long, split string",
    )
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in leakage_matrix(pairs, assigned).collect()
    }
    assert got == {("test", "train"): 1, ("train", "train"): 1}


# ---------------------------------------------- modularity_summary


def _canon(spark, pairs):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in pairs], "src long, dst long"
    )


def test_modularity_two_triangles_is_half(spark):
    # Two disjoint triangles, labels = their components: M=6,
    # sum_ec=6, d_c=6 each -> Q = (4*6*6 - 72) / (4*36) = 0.5.
    edges = _canon(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "vertex long, component long",
    )
    [r] = modularity_summary(edges, labels).collect()
    assert (r["n_communities"], r["m_edges"], r["q_ppm"]) == (2, 6, 500_000)


def test_modularity_single_community_is_zero(spark):
    edges = _canon(spark, [(1, 2), (2, 3), (1, 3)])
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "vertex long, component long"
    )
    [r] = modularity_summary(edges, labels).collect()
    assert (r["n_communities"], r["q_ppm"]) == (1, 0)


def test_modularity_can_go_negative(spark):
    # A single edge whose endpoints are in DIFFERENT communities:
    # sum_ec=0, d_c=1 each -> Q = (0 - 2) / 4 = -0.5.
    edges = _canon(spark, [(1, 2)])
    labels = spark.createDataFrame(
        [(1, 1), (2, 2)], "vertex long, component long"
    )
    [r] = modularity_summary(edges, labels).collect()
    assert r["q_ppm"] == -500_000
