"""Round-6 seventh-wave operators: ANALYZE-style column profiling,
exact nearest-rank winsorization, daily-volume anomaly flags, and
measured kNN-graph recall — the pytest layer under their SQL oracles."""

import datetime

from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
    column_profile,
    winsorized_spend,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.similarity import (
    knn_graph_recall,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
    daily_volume_anomalies,
)


# ------------------------------------------------------ column_profile


def test_column_profile_counts_nulls_distincts_and_bounds(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("a", 3), (None, 10)],
        "s string, v long",
    )
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"], r["min_s"], r["max_s"])
        for r in column_profile(df, ["s", "v"]).collect()
    }
    # n_distinct excludes NULL (both engines' COUNT DISTINCT contract);
    # min/max of the integer column are value-order, not string-order.
    assert got == {
        "s": (4, 1, 2, "a", "b"),
        "v": (4, 1, 3, "1", "10"),
    }


# ---------------------------------------------------- winsorized_spend


def test_winsorized_spend_clips_at_nearest_rank_percentiles(spark):
    # 100 orders priced 1.00 .. 100.00: nearest-rank p5 = 5.00,
    # p95 = 95.00; 4 rows clip low, 5 rows clip high.
    orders = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)],
        "o_orderkey long, o_totalprice double",
    )
    [r] = winsorized_spend(orders).collect()
    assert (r["n_orders"], r["p_lo_cents"], r["p_hi_cents"]) == (100, 500, 9500)
    assert (r["n_clipped_low"], r["n_clipped_high"]) == (4, 5)
    # sum(5..95)*100 + 4*500 + 5*9500
    assert r["winsorized_sum_cents"] == sum(range(5, 96)) * 100 + 4 * 500 + 5 * 9500


# --------------------------------------------- daily_volume_anomalies


def test_daily_volume_anomalies_flags_the_spike_day(spark):
    # 9 quiet days of 10 events + one day of 100: only the spike
    # clears |z| >= 2 under the integer inequality.
    rows = []
    eid = 0
    for d in range(1, 10):
        for _ in range(10):
            rows.append((eid, datetime.datetime(2024, 1, d, 12))); eid += 1
    for _ in range(100):
        rows.append((eid, datetime.datetime(2024, 1, 10, 12))); eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r["day"].day: (r["n_events"], r["flagged"]) for r in daily_volume_anomalies(ev).collect()}
    assert len(got) == 10
    assert got[10] == (100, True)
    assert all(not flagged for day, (_, flagged) in got.items() if day != 10)


def test_daily_volume_anomalies_constant_series_never_flags(spark):
    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 3, 6)) for i in range(9)
    ]  # 3 days x 3 events
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = daily_volume_anomalies(ev).collect()
    assert all(r["z"] == 0.0 and not r["flagged"] for r in out)


# ------------------------------------------------------ knn_graph_recall


def test_knn_graph_recall_is_one_on_a_clean_cluster(spark):
    # 4 sampled vectors within one tight cluster + far-away chaff:
    # identical vectors collide in every LSH table, so the graph
    # recovers the exact top-k and recall is 1.0.
    base = [1.0, 0.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(i, [x + 0.001 * i for x in base]) for i in range(4)]
        + [(10 + j, [0.0, 0.0, 0.0, 1.0 + 0.001 * j]) for j in range(4)],
        "vec_id long, embedding array<double>",
    )
    [r] = knn_graph_recall(emb, k=2, sample_below=4).collect()
    assert (r["k"], r["n_sampled"]) == (2, 4)
    assert r["n_matched"] == 8 and r["recall"] == 1.0
