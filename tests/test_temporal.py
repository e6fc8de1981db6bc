"""Tests for the temporal operators: as-of join (both directions,
tolerance, unmatched keys) and the multi-grain time rollup."""

import datetime

from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
    asof_join,
    time_rollup,
)


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def _fixtures(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(25)), (2, _ts(5))], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 100.0), (1, _ts(20), 200.0), (3, _ts(1), 999.0)],
        "k int, rt timestamp, v double",
    )
    return left, right


def _collect(df):
    return {
        (r["k"], r["t"].second): (
            r["asof_ts"].second if r["asof_ts"] else None,
            r["asof_v"],
        )
        for r in df.collect()
    }


def test_asof_backward(spark):
    left, right = _fixtures(spark)
    out = _collect(
        asof_join(left, right, on=["k"], left_ts="t", right_ts="rt", values=["v"])
    )
    assert out == {
        (1, 10): (8, 100.0),    # nearest earlier
        (1, 25): (20, 200.0),
        (2, 5): (None, None),   # key with no right rows: kept, nulled
    }


def test_asof_backward_inclusive_at_equal_ts(spark):
    left, right = _fixtures(spark)
    eq = spark.createDataFrame([(1, _ts(20))], "k int, t timestamp")
    out = _collect(
        asof_join(eq, right, on=["k"], left_ts="t", right_ts="rt", values=["v"])
    )
    assert out == {(1, 20): (20, 200.0)}  # <= is inclusive


def test_asof_forward(spark):
    left, right = _fixtures(spark)
    out = _collect(
        asof_join(
            left, right, on=["k"], left_ts="t", right_ts="rt", values=["v"],
            direction="forward",
        )
    )
    assert out == {
        (1, 10): (20, 200.0),   # nearest later
        (1, 25): (None, None),  # nothing later
        (2, 5): (None, None),
    }


def test_asof_tolerance(spark):
    left, right = _fixtures(spark)
    out = _collect(
        asof_join(
            left, right, on=["k"], left_ts="t", right_ts="rt", values=["v"],
            tolerance_seconds=3,
        )
    )
    # (1,10) gap 2s -> kept; (1,25) gap 5s -> nulled but row retained.
    assert out == {
        (1, 10): (8, 100.0),
        (1, 25): (None, None),
        (2, 5): (None, None),
    }


def test_time_rollup_grains(spark):
    events = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 10, 30), 1.0),
            (datetime.datetime(2024, 1, 1, 10, 45), 2.0),
            (datetime.datetime(2024, 1, 1, 11, 15), 4.0),
            (datetime.datetime(2024, 1, 2, 9, 0), 8.0),
        ],
        "ts timestamp, value double",
    )
    rows = {
        (r["gid"], r["day"], r["hour"]): (r["n_events"], r["total_value"])
        for r in time_rollup(events).collect()
    }
    d1 = datetime.datetime(2024, 1, 1)
    d2 = datetime.datetime(2024, 1, 2)
    h = lambda d, hh: datetime.datetime(2024, 1, d, hh)  # noqa: E731
    assert rows[(0, d1, h(1, 10))] == (2, 3.0)
    assert rows[(0, d1, h(1, 11))] == (1, 4.0)
    assert rows[(0, d2, h(2, 9))] == (1, 8.0)
    assert rows[(1, d1, None)] == (3, 7.0)      # day grain
    assert rows[(1, d2, None)] == (1, 8.0)
    assert rows[(3, None, None)] == (4, 15.0)   # grand total
    assert len(rows) == 6


def test_time_gapfill_forward_fill(spark):
    import datetime

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        time_gapfill,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)
    rows = [
        (1, t(0, 5), 7, "click", 10.0, "{}"),
        (2, t(0, 40), 7, "click", 5.0, "{}"),   # same hour: sums to 15
        (3, t(3, 10), 7, "click", 2.0, "{}"),   # hours 1,2 are gaps
        (4, t(1, 0), 8, "view", 1.0, "{}"),     # single-hour key: no gaps
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        "value double, props string"
    )
    out = {(r.event_type, r.hour.hour): r for r in time_gapfill(events).collect()}
    assert out[("click", 0)].value_filled == 15.0 and out[("click", 0)].filled == 0
    assert out[("click", 1)].value_filled == 15.0 and out[("click", 1)].filled == 1
    assert out[("click", 2)].value_filled == 15.0 and out[("click", 2)].filled == 1
    assert out[("click", 3)].value_filled == 2.0 and out[("click", 3)].filled == 0
    assert out[("view", 1)].value_filled == 1.0
    assert len(out) == 5  # click hours 0-3 + view hour 1


def test_interval_join_containment_and_boundaries(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        interval_join,
    )

    events = spark.createDataFrame(
        [
            (1, "u", "2024-01-01 10:00:00"),  # == start: included
            (2, "u", "2024-01-01 11:59:59"),  # inside, later bucket
            (3, "u", "2024-01-01 12:00:00"),  # == end: excluded
            (4, "u", "2024-01-01 09:59:59"),  # before
            (5, "v", "2024-01-01 10:30:00"),  # wrong key
        ],
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    intervals = spark.createDataFrame(
        [
            ("u", 100, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
            ("u", 101, "2024-01-01 11:00:00", "2024-01-01 11:00:00"),  # empty
        ],
        "user_id string, iv_id long, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp_ntz")).withColumn(
        "end", F.col("end").cast("timestamp_ntz")
    )
    out = interval_join(events, intervals, keys=["user_id"])
    got = {(r["event_id"], r["iv_id"]) for r in out.collect()}
    assert got == {(1, 100), (2, 100)}
    # equi join on (key, bucket) — never a nested-loop plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_interval_join_multibucket_spans_and_day_granularity(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        interval_join,
    )

    events = spark.createDataFrame(
        [(i, f"2024-01-{d:02d} 06:00:00") for i, d in enumerate(range(1, 11), 1)],
        "event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    # one interval spanning 5 days, one spanning 1 second on day 8
    intervals = spark.createDataFrame(
        [
            (100, "2024-01-02 00:00:00", "2024-01-07 00:00:00"),
            (101, "2024-01-08 05:59:59", "2024-01-08 06:00:00"),
        ],
        "iv_id long, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp_ntz")).withColumn(
        "end", F.col("end").cast("timestamp_ntz")
    )
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(events, intervals, granularity="day").collect()
    }
    # interval 100 covers days 2..6 inclusive (end 07 00:00 exclusive)
    assert got == {(2, 100), (3, 100), (4, 100), (5, 100), (6, 100)}
    # hour granularity agrees (buckets don't change semantics)
    got_h = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(events, intervals, granularity="hour").collect()
    }
    assert got_h == got
