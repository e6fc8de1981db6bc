"""Unit tests for the relational analytics operators."""

import datetime

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
    brand_revenue,
    event_props_filter,
    event_windows,
    pricing_summary,
    top_events_per_type,
)


@pytest.fixture(scope="module")
def lineitem(spark):
    ts = datetime.datetime(1995, 6, 1)
    late = datetime.datetime(1999, 1, 1)
    rows = [
        (1, 10, 1.0, 100.0, 0.10, 0.05, "A", "F", ts),
        (2, 10, 2.0, 200.0, 0.00, 0.10, "A", "F", ts),
        (3, 20, 3.0, 300.0, 0.20, 0.00, "N", "O", ts),
        (4, 20, 9.0, 900.0, 0.50, 0.50, "N", "O", late),  # past cutoff
    ]
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double, l_extendedprice double,"
        "l_discount double, l_tax double, l_returnflag string, l_linestatus string,"
        "l_shipdate timestamp",
    )


@pytest.fixture(scope="module")
def events(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=40 * i), i % 3, "click" if i % 2 else "view",
         float(i), '{"k": %d}' % (i * 10))
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        "value double, props string"
    )


def test_pricing_summary_values(lineitem):
    out = {(r["l_returnflag"], r["l_linestatus"]): r for r in pricing_summary(lineitem).collect()}
    af = out[("A", "F")]
    assert af["count_order"] == 2
    assert af["sum_qty"] == 3.0
    assert af["sum_base_price"] == 300.0
    # 100*0.9 + 200*1.0 = 290
    assert af["sum_disc_price"] == pytest.approx(290.0)
    # 90*1.05 + 200*1.10 = 314.5
    assert af["sum_charge"] == pytest.approx(314.5)
    assert af["avg_disc"] == pytest.approx(0.05)
    no = out[("N", "O")]
    assert no["count_order"] == 1  # the late row is filtered at the scan


def test_event_windows_buckets(events):
    rows = event_windows(events, duration="1 hour").collect()
    # events at minutes 0,40 land in hour 0; 80,120(boundary->hour2)...
    # minutes: 0,40 -> h0; 80 -> h1; 120,160 -> h2; 200 -> h3
    per_window = {}
    for r in rows:
        per_window.setdefault(r["window_start"].hour, 0)
        per_window[r["window_start"].hour] += r["n_events"]
    assert per_window == {0: 2, 1: 1, 2: 2, 3: 1}
    assert all(r["window_end"] > r["window_start"] for r in rows)


def test_top_events_per_type(events):
    rows = top_events_per_type(events, k=2).collect()
    clicks = sorted((r["rnk"], r["event_id"]) for r in rows if r["event_type"] == "click")
    assert clicks == [(1, 5), (2, 3)]  # odd ids are clicks, top value = id
    assert all(r["rnk"] <= 2 for r in rows)


def test_event_props_filter_extracts_json(events):
    out = {r["event_type"]: r for r in event_props_filter(events, min_k=30).collect()}
    # k = id*10 >= 30 -> ids 3,4,5; clicks: 3,5 (k 30,50); views: 4 (k 40)
    assert out["click"]["n_events"] == 2
    assert out["click"]["avg_k"] == pytest.approx(40.0)
    assert out["view"]["n_events"] == 1


def test_pricing_summary_pushes_date_filter_to_scan(spark, lineitem, tmp_path):
    # Through a real parquet scan, the shipdate predicate must reach
    # the reader (PushedFilters) instead of filtering post-scan.
    p = str(tmp_path / "li.parquet")
    lineitem.write.parquet(p)
    plan = (
        pricing_summary(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_brand_revenue_broadcast_join(spark, lineitem):
    part = spark.createDataFrame(
        [(10, "BRAND#1"), (20, "BRAND#2")], "p_partkey long, p_brand string"
    )
    out = {r["p_brand"]: r for r in brand_revenue(lineitem, part).collect()}
    assert out["BRAND#1"]["n_items"] == 2
    assert out["BRAND#1"]["revenue"] == pytest.approx(290.0)
    assert out["BRAND#2"]["n_items"] == 2
    assert out["BRAND#2"]["revenue"] == pytest.approx(300.0 * 0.8 + 900.0 * 0.5)
    # The dimension side must be planned as a broadcast join.
    plan = brand_revenue(lineitem, part)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

def test_sessionize_events_gap_boundaries(spark):
    import datetime
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        sessionize_events,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    mins = lambda m: t0 + datetime.timedelta(minutes=m)
    rows = [
        (1, mins(0), 7, "click", 1.0, "{}"),
        (2, mins(10), 7, "view", 2.0, "{}"),    # same session (gap 10m)
        (3, mins(50), 7, "click", 3.0, "{}"),   # new session (gap 40m)
        (4, mins(55), 8, "click", 4.0, "{}"),   # other user, own session
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        "value double, props string"
    )
    out = {(r["user_id"], r["session_no"]): r for r in sessionize_events(events, gap_minutes=30).collect()}
    assert out[(7, 1)]["n_events"] == 2 and out[(7, 1)]["total_value"] == 3.0
    assert out[(7, 2)]["n_events"] == 1 and out[(7, 2)]["session_start"] == mins(50)
    assert out[(8, 1)]["n_events"] == 1
    assert len(out) == 3


def test_revenue_rollup_subtotals(spark, lineitem):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        revenue_rollup,
    )

    rows = revenue_rollup(lineitem).collect()
    leaf = [r for r in rows if r["gid"] == 0]
    flag = {r["l_returnflag"]: r for r in rows if r["gid"] == 1}
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    assert total[0]["n_items"] == sum(r["n_items"] for r in leaf)
    assert total[0]["revenue"] == pytest.approx(sum(r["revenue"] for r in leaf))
    for f, r in flag.items():
        assert r["n_items"] == sum(x["n_items"] for x in leaf if x["l_returnflag"] == f)


def test_event_type_pivot_counts_and_value(spark):
    import datetime

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        event_type_pivot,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0, 7, "purchase", 25.5, "{}"),
        (3, t0, 7, "purchase", 4.5, "{}"),
        (4, t0, 8, "view", 2.0, "{}"),
        (5, t0, 8, "unknown_type", 9.0, "{}"),  # dropped: not a pivot value
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        "value double, props string"
    )
    out = {r["user_id"]: r for r in event_type_pivot(events).collect()}
    assert out[7]["n_click"] == 1 and out[7]["n_purchase"] == 2
    assert out[7]["purchase_value"] == pytest.approx(30.0)
    assert out[8]["n_view"] == 1 and out[8]["n_purchase"] == 0
    assert out[8]["purchase_value"] == 0.0  # no purchases -> 0, not NULL


def test_forecast_revenue_fixture(spark):
    # Three rows: only the middle one passes all four predicates.
    import datetime

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        forecast_revenue,
    )

    d = datetime.datetime
    rows = [
        (d(1995, 6, 1), 100.0, 0.06, 10.0),   # in: 100*0.06 = 6.00
        (d(1995, 6, 1), 100.0, 0.08, 10.0),   # discount out of band
        (d(1996, 6, 1), 100.0, 0.06, 10.0),   # date out of range
        (d(1995, 6, 1), 100.0, 0.06, 30.0),   # quantity too large
    ]
    li = spark.createDataFrame(
        rows, "l_shipdate timestamp, l_extendedprice double, l_discount double, l_quantity double"
    )
    got = forecast_revenue(li).collect()[0]
    assert got.revenue == 6.0


def test_small_quantity_revenue_fixture(spark):
    # One brand part with quantities [1, 10, 10, 10, 10]: avg = 8.2,
    # 0.2*avg = 1.64 -> only the qty-1 row is "small"; its price / 7.
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        small_quantity_revenue,
    )

    part = spark.createDataFrame(
        [(1, "Brand#23"), (2, "Brand#11")], "p_partkey long, p_brand string"
    )
    li = spark.createDataFrame(
        [(1, q, 70.0) for q in (1.0, 10.0, 10.0, 10.0, 10.0)]
        + [(2, 1.0, 999.0)],  # other brand: ignored
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    got = small_quantity_revenue(li, part).collect()[0]
    assert got.avg_yearly == 10.0  # 70 / 7


def test_skyline_2d_dominance_and_ties(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        skyline_2d,
    )

    rows = [
        (1, 10, 5.0),   # frontier (best price at size 10)
        (2, 10, 7.0),   # dominated by 1 (same size, higher price)
        (3, 20, 5.0),   # frontier — dominates 1? size 20 > 10, price equal -> strict dominance of 1
        (4, 20, 4.0),   # frontier (beats 3 on price)
        (5, 5, 3.0),    # frontier (cheapest overall)
        (6, 5, 3.0),    # tie of 5: both kept (no STRICT dominance)
        (7, 4, 3.0),    # dominated by 5 (bigger size, equal price)
    ]
    df = spark.createDataFrame(rows, "id long, size int, price double")
    got = {r.id for r in skyline_2d(df, maximize="size", minimize="price").collect()}
    # 1 is dominated by 3 (size 20 >= 10, price 5 <= 5, strict on size).
    # 3 is dominated by 4 (equal size, strictly lower price).
    assert got == {4, 5, 6}


def test_event_transitions_fixture(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        event_transitions,
    )
    from datetime import datetime as dt

    rows = [
        (1, dt(2024, 1, 1, 0, 0), 1, "a"),
        (2, dt(2024, 1, 1, 0, 1), 1, "b"),
        (3, dt(2024, 1, 1, 0, 2), 1, "a"),
        (4, dt(2024, 1, 1, 0, 0), 2, "a"),
        (5, dt(2024, 1, 1, 0, 5), 2, "b"),
        # equal timestamps: event_id tie-break orders 6 before 7
        (6, dt(2024, 1, 1, 1, 0), 3, "b"),
        (7, dt(2024, 1, 1, 1, 0), 3, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.p_scaled)
        for r in event_transitions(ev).collect()
    }
    # from 'a': a->b twice (users 1, 2); from 'b': b->a twice (users 1, 3).
    assert got == {("a", "b"): (2, 1000000), ("b", "a"): (2, 1000000)}


def test_gini_concentration_fixture(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        gini_concentration,
    )

    # Per-customer cents [1, 1, 2, 4] (customer 3 split over two
    # orders): sorted ranks give SUM(i*x) = 1+2+6+16 = 25, S = 8,
    # n = 4 -> G = (50 - 40) / 32 = 0.3125 = 312500 ppm.
    orders = spark.createDataFrame(
        [
            (1, 0.01),
            (2, 0.01),
            (3, 0.01),
            (3, 0.01),
            (4, 0.04),
        ],
        "o_custkey long, o_totalprice double",
    )
    got = gini_concentration(orders).collect()[0]
    assert (got.n_customers, got.total_cents, got.gini_ppm) == (4, 8, 312500)
    # Perfect equality: G = 0 exactly.
    eq = spark.createDataFrame(
        [(c, 1.0) for c in range(1, 6)], "o_custkey long, o_totalprice double"
    )
    assert gini_concentration(eq).collect()[0].gini_ppm == 0
