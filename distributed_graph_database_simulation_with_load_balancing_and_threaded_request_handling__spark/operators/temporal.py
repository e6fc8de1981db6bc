"""Temporal operators Spark lacks as built-ins: as-of join and
hypertable-style multi-grain time rollup.

Extension beyond the reference (SURVEY.md §2.2 — its only temporal
notion is request arrival order, load_balancer.c:49); these are the
standard time-series shapes a training-data/analytics pipeline needs.

Scale posture: the as-of join is the UNION-MERGE rendering (tag both
sides, one shuffle of |L|+|R| rows keyed on the join key, per-key sort,
``last(ignorenulls)`` fill) — never a range cross join, never a
per-row subquery.  Cost is one exchange + one in-partition sort at any
scale; a pathologically hot key is a window-skew problem (pre-salt the
key or split by time range — AQE does not split windows).  The rollup
is a single GROUP BY ROLLUP pass: partial aggregation happens map-side
for every grain at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    values: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach ``values`` from the single right row
    with the greatest ``right_ts`` <= ``left_ts`` (direction
    "backward"; "forward" = smallest ``right_ts`` >= ``left_ts``) for
    the same ``on`` key — the pandas ``merge_asof`` contract,
    distributed.

    ``right`` must be unique per (on, right_ts); pre-aggregate
    duplicates first or the tie pick is unspecified.  With
    ``tolerance_seconds``, matches farther than the tolerance are
    nulled (left row is kept — this is a left join).

    Output: all left columns, then one ``asof_<v>`` per value column
    and ``asof_ts`` (the matched right timestamp).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    rschema = dict(zip(right.schema.names, [f.dataType for f in right.schema.fields]))
    lschema = dict(zip(left.schema.names, [f.dataType for f in left.schema.fields]))
    lcols = left.columns

    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rschema[right_ts]).alias("_rt"),
        *[F.lit(None).cast(rschema[v]).alias(f"_rv_{v}") for v in values],
    )
    r_tagged = right.select(
        *[F.col(k) for k in on],
        *[F.lit(None).cast(lschema[c]).alias(c) for c in lcols if c not in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_rt"),
        *[F.col(v).alias(f"_rv_{v}") for v in values],
    ).select(*l_tagged.columns)  # identical column order for the union

    merged = l_tagged.unionByName(r_tagged)
    # Backward: right rows sort before the left rows they serve
    # (equal ts inclusive via the _side tiebreak), running last-fill.
    # Forward is the mirror image (descending scan).
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_t").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    filled = merged.select(
        "*",
        F.last("_rt", ignorenulls=True).over(w).alias("_m_ts"),
        *[
            F.last(f"_rv_{v}", ignorenulls=True).over(w).alias(f"_m_{v}")
            for v in values
        ],
    ).where(F.col("_side") == 1)

    within = F.lit(True)
    if tolerance_seconds is not None:
        gap = F.unix_timestamp("_t") - F.unix_timestamp("_m_ts")
        if direction == "forward":
            gap = -gap
        within = F.col("_m_ts").isNotNull() & (gap <= int(tolerance_seconds))
    return filled.select(
        *lcols,
        F.when(within, F.col("_m_ts")).alias("asof_ts"),
        *[F.when(within, F.col(f"_m_{v}")).alias(f"asof_{v}") for v in values],
    )


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    granularity: str = "hour",
) -> DataFrame:
    """Distributed range join: each ``left`` row matched to every
    interval containing its timestamp (half-open ``[start, end)``),
    optionally co-keyed on ``keys`` — the interval/range join Spark
    has no built-in operator for.

    Spark plans a naive ``ts BETWEEN start AND end`` predicate as a
    nested-loop join (quadratic).  This operator makes it an EQUI
    join: both sides are bucketed to ``granularity`` — the event to
    its one containing bucket, the interval exploded to every bucket
    it spans — joined hash-style on (keys..., bucket), then filtered
    to exact containment.  An event's bucket is unique, so each
    qualifying (event, interval) pair meets exactly once: no dedup.

    Scale: shuffle is an ordinary hash-partitioned equi join;
    interval-side row growth is ceil(length/bucket) per interval —
    pick ``granularity`` near the typical interval length so the
    factor stays small.  Skewed keys are plain join skew (AQE
    splits); an interval spanning MANY buckets fans out narrowly
    before the shuffle, never quadratically.  Intervals with
    ``end <= start`` are dropped (empty half-open range).
    """
    keys = keys or []
    gran = granularity
    lb = left.withColumn("_bucket", F.date_trunc(gran, F.col(ts_col)))
    iv = intervals.where(F.col(end_col) > F.col(start_col))
    ib = iv.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(gran, F.col(start_col)),
                F.date_trunc(
                    gran, F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr(f"INTERVAL 1 {gran}"),
            )
        ),
    )
    return (
        lb.join(ib, on=keys + ["_bucket"])
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )


def time_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style multi-grain rollup in ONE pass: event counts
    and value sums at hour grain, day grain, and grand total via
    GROUP BY ROLLUP(day, hour).  ``gid`` labels the grain
    (0 = hour row, 1 = day row, 3 = grand total, the standard
    grouping-id bitmask).

    Map-side partial aggregation covers every grain simultaneously —
    the shuffle carries one partial row per (grain, bucket), not one
    per event; this is the batch materialization a continuous
    aggregate would maintain incrementally.
    """
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    return (
        events.select(day, hour, F.col(value_col).alias("_v"))
        .rollup("day", "hour")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("_v"), 4).alias("total_value"),
        )
    )


def trailing_window_spend(
    orders: DataFrame,
    *,
    days: int = 30,
) -> DataFrame:
    """Per-customer trailing-``days``-day spend under a VALUE-based
    window frame — ``RANGE BETWEEN (days-1) PRECEDING AND CURRENT
    ROW`` over an integer day number — the sliding temporal aggregate
    ROWS frames cannot express (a RANGE frame spans by ORDER-BY
    *value*, so sparse order histories still cover the full calendar
    span and same-day orders aggregate together).  Returns
    ``(o_orderkey, o_custkey, day_num, trailing_cents, n_in_window)``.

    Scale notes: the window is keyed on ``o_custkey`` — bounded rows
    per key, real parallelism; the frame bound is an integer day
    delta, so the comparison never touches timestamps (timezone-free,
    engine-exact); cents keep the sum integer.
    """
    day_num = F.datediff(
        F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
    ).alias("day_num")
    cents = F.expr(
        "CAST(round(o_totalprice * 100) AS BIGINT)"
    ).alias("cents")
    base = orders.select("o_orderkey", "o_custkey", day_num, cents)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-(int(days) - 1), 0)
    )
    return base.select(
        "o_orderkey",
        "o_custkey",
        "day_num",
        F.sum("cents").over(w).cast("long").alias("trailing_cents"),
        F.count("*").over(w).cast("long").alias("n_in_window"),
    )


def time_gapfill(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regularize a sparse series onto a dense hourly grid with
    forward fill: per key, one row for EVERY hour between that key's
    first and last event; hours with no events carry the most recent
    observed hourly total (``filled=1`` marks carried rows).  The
    gap-filling half of the hypertable surface (``time_rollup`` is
    the aggregation half): downstream joins/windows get a dense,
    regular series instead of punching NULL holes.

    Scale: the grid explodes from per-key (min, max) BOUNDS — one
    aggregated row per key, never from the raw data — so grid size is
    keys x span-hours regardless of event count; the fill is one
    in-partition window pass per key (``last(ignorenulls)`` over an
    unbounded-preceding ROWS frame).  Decimal hour-sums keep the
    carried values bit-stable.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = events.groupBy(
        F.col(key_col).alias("k"), hour.alias("h")
    ).agg(F.round(F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 4).alias("v"))
    bounds = hourly.groupBy("k").agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        "k",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["k", "h"], "left")
    return joined.select(
        F.col("k").alias(key_col),
        F.col("h").alias("hour"),
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("int").alias("filled"),
    )


def activity_profile_similarity(
    events: DataFrame,
    ref_user: int,
    *,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Time-series similarity search in profile form (the streaming
    time-series-similarity literature's fixed-dimension reduction):
    each entity's activity series is collapsed to a 24-bin
    hour-of-day profile (exact DECIMAL sums scaled to integer cents),
    and entities are ranked by the integer dot product of their
    profile against a REFERENCE entity's — "who behaves like user
    X".  Returns the top-``k`` ``(user_id, dot)``.

    Every quantity is integer-exact (decimal sums -> cents -> long
    products), and the ordering ties break on user id, so the top-k
    set is engine-exact — the same determinism posture as the
    fixed-point PageRank.

    Scale: one groupBy builds all profiles (24 rows/entity), the
    24-row reference profile broadcasts, and scoring is a linear
    map-side join + per-entity sum — NO pairwise expansion (the
    all-pairs variant needs the LSH/IVF blocking of similarity.py;
    this is the exact one-vs-all path, linear in entities at any
    scale).
    """
    cents = (F.sum(F.col(val_col).cast("decimal(18,2)")) * 100).cast("long")
    prof = events.groupBy(
        F.col(user_col).alias("u"), F.hour(ts_col).alias("h")
    ).agg(cents.alias("v"))
    ref = prof.where(F.col("u") == int(ref_user)).select(
        "h", F.col("v").alias("rv")
    )
    return (
        prof.join(F.broadcast(ref), "h")
        .where(F.col("u") != int(ref_user))
        .groupBy("u")
        .agg(F.sum(F.col("v") * F.col("rv")).cast("long").alias("dot"))
        .orderBy(F.desc("dot"), "u")
        .limit(k)
        .select(F.col("u").cast("long").alias("user_id"), "dot")
    )


def cumulative_new_users(
    events: DataFrame, *, type_col: str | None = None
) -> DataFrame:
    """Daily new-user and cumulative-user counts — the growth curve an
    operations dashboard reads: a user is "new" on the day of their
    FIRST event (exact, not approximate: one min-aggregation per
    user), and the cumulative column is the running sum over days.
    With ``type_col`` the curve is per event type ("first time each
    user performs each action"), one adoption curve per type.

    Scale posture: the per-user min is one map-side-combined groupBy
    over the fact stream; the day rollup reduces to calendar-bounded
    cardinality BEFORE the running-sum window, so the window orders
    thousands of day rows, never event rows — the same bounded-domain
    argument as revenue_trend's day grouping.  The per-type variant's
    window is additionally PARTITIONED by type, so no single task
    ever holds more than one type's calendar.

    Returns ``([type_col,] day, new_users, cume_users)``.
    """
    from pyspark.sql.window import Window

    keys = ([type_col] if type_col else []) + ["day"]
    first = events.groupBy(
        *(([type_col] if type_col else []) + ["user_id"])
    ).agg(F.min(F.to_date("ts")).alias("day"))
    daily = first.groupBy(*keys).agg(
        F.count("*").cast("long").alias("new_users")
    )
    w = (
        Window.partitionBy(type_col) if type_col else Window
    ).orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        *keys,
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cume_users"),
    )


def daily_volume_anomalies(
    events: DataFrame, *, z_threshold: int = 2, round_digits: int = 4
) -> DataFrame:
    """Operational anomaly readout: every day's event volume with its
    z-score against the whole series, flagged where |z| >= threshold.
    The flag is the ``spend_outliers`` pure-BIGINT inequality
    ((n*y - S)^2 >= t^2 (n*SS - S^2)) so the flagged set cannot drift
    at a float boundary; the reported z is display-only.

    Scale posture: one map-side-combined day rollup reduces the fact
    stream to calendar-bounded rows; the one-row moment aggregate is
    broadcast back over those day rows only.

    Returns ``(day, n_events, z, flagged)`` for EVERY day (the
    anomaly-free weeks are part of the readout).
    """
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n_events")
    )
    mom = daily.agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("s"),
        F.sum(F.expr("n_events * n_events")).alias("ss"),
    )
    t2 = int(z_threshold) ** 2
    return (
        daily.crossJoin(F.broadcast(mom))
        .select(
            "day",
            "n_events",
            F.when(
                F.expr("n * ss - s * s") <= 0, F.lit(0.0)
            )
            .otherwise(
                F.round(
                    F.expr(
                        "CAST(n * n_events - s AS DOUBLE)"
                        " / sqrt(CAST(n * ss - s * s AS DOUBLE))"
                    ),
                    round_digits,
                )
            )
            .alias("z"),
            F.expr(
                "n * ss - s * s > 0 AND "
                "(n * n_events - s) * (n * n_events - s)"
                f" >= {t2} * (n * ss - s * s)"
            ).alias("flagged"),
        )
    )
