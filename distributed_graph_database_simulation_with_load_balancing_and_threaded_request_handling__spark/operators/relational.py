"""Relational analytics operators over the event/lineitem tables —
the standard-category surface the reference has no analogue for
(SURVEY.md §2.2: joins, windows, sorts, date/JSON scalar functions are
all absent there; the engine provides them as first-class declared
queries).

Scale notes per operator are inline; the common thread: aggregations
are partial-aggregated on their grouping keys, small dimensions are
broadcast explicitly, and the only global sorts are on
post-aggregation row counts (a handful of groups), never raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Sums over large double columns are order-sensitive; aggregating in
# DECIMAL makes them exact and therefore bit-identical to the DuckDB
# oracle regardless of partitioning/order.  Cast back to double (and
# round) only at the output boundary.
_DEC = "decimal(18,2)"


def pricing_summary(lineitem: DataFrame, *, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus)
    totals over shipped lineitems.

    The shipdate filter reaches the parquet scan (PushedFilters);
    grouping cardinality is tiny so the shuffle after map-side partial
    aggregation carries a handful of rows per partition.
    """
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(price * (1 - disc)).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(price * (1 - disc) * (1 + tax)).cast("double"), 4).alias("sum_charge"),
            # Averages divide the exact decimal sum AFTER the double
            # cast: double / long is deterministic, while decimal
            # division scale rules differ between engines.
            F.round(F.sum(qty).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / F.count("*"), 6).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def event_windows(events: DataFrame, *, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window event rollup: count + value sum per
    (window, event_type) — the batch twin of the streaming
    request_load aggregation (same grouping, same state shape).
    """
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def top_events_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events by value within each event_type (ties broken by
    event_id) — the partitioned-window top-k pattern.  The window sort
    is per-type (parallel across types), never global.
    """
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        events.select(
            "event_type",
            "event_id",
            F.round("value", 6).alias("value"),
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .where(F.col("rnk") <= k)
    )


def event_props_filter(events: DataFrame, *, min_k: int = 50) -> DataFrame:
    """JSON scalar-function surface: extract ``$.k`` from the props
    JSON column, filter, and count per event_type.  get_json_object is
    JVM-side (Jackson), evaluated in the scan projection."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k") >= min_k)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def sessionize_events(
    events: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Gap-based sessionization: a user's events belong to one session
    until a silence longer than ``gap_minutes``; the classic
    lag + running-sum-of-boundaries construction.  Returns one row per
    session: (user_id, session_no, session_start, session_end,
    n_events, total_value).

    Scale: both windows partition by user_id — parallel across users,
    and the per-user sort is bounded by one user's history.  This is
    the batch twin of Structured Streaming's
    ``groupBy(session_window(...))``.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        # Exact microsecond arithmetic so the boundary decision is
        # bit-identical to the oracle's epoch_us.  timestamp_diff
        # (not unix_micros) because it accepts both TIMESTAMP and
        # TIMESTAMP_NTZ — the testdata parquet stores plain
        # micros (no zone), which Spark 4 reads as NTZ.
        (
            prev_ts.isNull()
            | (
                F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts"))
                > gap_minutes * 60 * 1_000_000
            )
        )
        .cast("int")
        .alias("boundary"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sess = flagged.select(
        "user_id", "ts", "event_id", "value", F.sum("boundary").over(run).alias("session_no")
    )
    return (
        with_sess.groupBy("user_id", F.col("session_no").cast("int").alias("session_no"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def user_cohort(
    events: DataFrame,
    *,
    min_purchase: float = 100.0,
    min_click: float = 100.0,
    error_cap: float = 400.0,
) -> DataFrame:
    """Set-operation surface: users with a purchase of value >=
    ``min_purchase`` INTERSECT users with a click of value >=
    ``min_click``, EXCEPT users with any error of value >=
    ``error_cap``.  Spark plans intersect/subtract as aggregations +
    joins on the distinct user key — three small exchanges of bare
    ids; the type/value predicates push into the scan."""
    def users(t: str, vmin: float) -> DataFrame:
        return (
            events.where((F.col("event_type") == t) & (F.col("value") >= vmin))
            .select("user_id")
            .distinct()
        )

    return (
        users("purchase", min_purchase)
        .intersect(users("click", min_click))
        .subtract(users("error", error_cap))
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, *, min_total: float = 0.0
) -> DataFrame:
    """Anti-join surface: customers with no order totaling more than
    ``min_total``.  left_anti keeps the probe side streaming — the
    build side is the filtered distinct order keys, broadcast when
    small enough; the price predicate pushes into the orders scan."""
    qualifying = orders.where(F.col("o_totalprice") > min_total).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(qualifying, on="c_custkey", how="left_anti").select(
        "c_custkey", "c_name"
    )


def quality_percentiles(documents: DataFrame) -> DataFrame:
    """Distribution stats: exact interpolated p25/p50/p90 of document
    length per language.  Exact percentile needs the group's values
    together (a per-group sort) — fine on a language key; for
    high-cardinality keys switch to approx_percentile (t-digest,
    mergeable map-side)."""
    n = F.length("text").cast("double")
    return documents.groupBy("lang").agg(
        *[
            F.round(F.percentile(n, F.lit(p)), 4).alias(f"p{int(p * 100)}_chars")
            for p in (0.25, 0.5, 0.9)
        ],
        F.count("*").cast("long").alias("n_docs"),
    )


def brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand discounted revenue: fact-to-dimension join with the
    dimension side explicitly broadcast — at 100 TB the lineitem side
    never shuffles; each task streams its scan partition against the
    replicated part table (classic star-schema join strategy).
    """
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    return (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")),
                      lineitem["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(price * (1 - disc)).cast("double"), 4).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def revenue_rollup(lineitem: DataFrame) -> DataFrame:
    """Hierarchical subtotals in one pass: revenue and item counts per
    (returnflag, linestatus), per returnflag, and grand total, via
    ``ROLLUP`` (SURVEY.md §2.2 aggregations — multi-level grouping the
    reference has no analogue for).

    ``gid`` is the grouping bitmask (0 = leaf row, 1 = per-flag
    subtotal, 3 = grand total) so consumers — and the value oracle —
    can distinguish subtotal rows from leaf rows whose keys are NULL.

    Scale: Spark expands the rollup BEFORE the exchange, so map-side
    partial aggregation covers all three grouping sets in the one
    shuffle; output cardinality is the sum of the grouping-set
    cardinalities (tiny here).  Decimal aggregation keeps the sums
    exact (see ``_DEC``).
    """
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(price * (1 - disc)).cast("double"), 4).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
        F.grouping_id().cast("int").alias("gid"),
    )


def revenue_grouping_sets(lineitem: DataFrame) -> DataFrame:
    """Arbitrary (non-hierarchical) grouping sets in one pass —
    ``GROUPING SETS ((returnflag, linestatus), (linestatus), ())`` —
    the general form ROLLUP/CUBE are sugar for: the leaf grid plus the
    SECOND dimension's marginals plus the grand total, which
    ``ROLLUP(returnflag, linestatus)`` (first-dimension marginals)
    cannot express.

    Scale: same as ``revenue_rollup`` — the sets expand before the
    exchange, so one map-side-combined shuffle serves all three;
    output is the sum of the set cardinalities.  ``gid`` disambiguates
    subtotal rows from leaf rows with NULL keys.
    """
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    return lineitem.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.round(F.sum(price * (1 - disc)).cast("double"), 4).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
        F.grouping_id().cast("int").alias("gid"),
    )


def event_type_pivot(
    events: DataFrame,
    types: tuple[str, ...] = ("click", "view", "purchase", "signup", "error"),
) -> DataFrame:
    """Long-to-wide: one row per user with a count column per event
    type (``n_<type>``) and the summed purchase value.

    The pivot values are EXPLICIT — passing them skips the
    distinct-values discovery job Spark otherwise runs, and makes the
    output schema static (a 100-TB scan to learn column names is the
    classic accidental-second-pass); unlisted types are dropped by the
    pivot, exactly like the SQL conditional-aggregation form the
    oracle uses.  One shuffle on ``user_id`` with map-side partials.
    """
    value = F.col("value").cast(_DEC)
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", list(types))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value).cast("double"), 4).alias("val"),
        )
    )
    cols = [F.col("user_id")]
    for t in types:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"n_{t}"))
    cols.append(F.coalesce(F.col("purchase_val"), F.lit(0.0)).alias("purchase_value"))
    return wide.select(*cols)


def running_customer_spend(orders: DataFrame) -> DataFrame:
    """Cumulative spend per customer in order-date order (explicit
    ROWS frame, deterministic ``o_orderkey`` tie-break so the running
    value is well-defined even on same-day orders).

    Scale: one shuffle on ``o_custkey``; the running sum is a single
    in-partition pass.  Decimal accumulation keeps every prefix sum
    exact (``_DEC``), so the output is bit-stable under any
    partitioning.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.round(
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double"), 4
        ).alias("cum_spend"),
    )


def ship_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    date: str = "1995-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k undelivered orders by discounted revenue
    for one market segment — orders placed before ``date`` with items
    still shipping after it.  Returns
    ``(o_orderkey, o_orderdate, revenue)``.

    Scale notes: both date predicates and the segment filter reach the
    parquet scans (PushedFilters) and every table is pruned to the
    join/aggregate columns before joining.  The filtered customer
    projection is a key-only dimension (one bigint per qualifying
    customer), far under the fact side — explicitly broadcast so the
    orders scan never shuffles for it; the orders⋈lineitem join
    shuffles on the natural o_orderkey/l_orderkey key, which is also
    the aggregation key, so the groupBy reuses the join exchange
    rather than adding one.  Revenue sums in DECIMAL (exact,
    order-independent); top-k is orderBy().limit(k) =
    TakeOrderedAndProject (per-partition heap + driver merge, no
    global sort).  Ties broken by o_orderkey so the k rows are
    deterministic for the value oracle.
    """
    cutoff = F.lit(date).cast("timestamp")
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
        ).alias("disc_price"),
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum("disc_price").cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    date_from: str = "1994-01-01",
    date_to: str = "1995-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue from orders where the
    customer and the line's supplier sit in the same nation, limited
    to one region and one order-date year.  Returns
    ``(n_name, revenue)`` sorted by revenue descending.

    Scale notes: the six-way join decomposes into one fact-fact
    shuffle (orders⋈lineitem on the orderkey) plus broadcasts —
    region⋈nation⋈supplier collapses to a small (s_suppkey,
    n_nationkey, n_name) dimension that is broadcast against the fact
    stream, and the customer keyset check rides the same broadcast
    nation row via c_nationkey = s_nationkey.  customer itself is the
    one genuinely large dimension: it joins on o_custkey BEFORE the
    lineitem shuffle so the fact rows it filters never move.  The
    final groupBy is nation-cardinality — trivially small after
    map-side combine.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    # region -> nations in region -> suppliers in those nations
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey", "n_name")
    sup = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_custkey"
    )
    oc = o.join(
        customer.select("c_custkey", "c_nationkey"),
        o["o_custkey"] == F.col("c_custkey"),
    ).select("o_orderkey", "c_nationkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
        ).alias("disc_price"),
    )
    joined = oc.join(li, oc["o_orderkey"] == li["l_orderkey"]).join(
        F.broadcast(sup),
        (F.col("l_suppkey") == sup["s_suppkey"])
        & (F.col("c_nationkey") == sup["s_nationkey"]),
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum("disc_price").cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, *, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts
    (including the zero-order customers an inner join would lose) —
    ``(c_count, custdist)`` sorted by custdist then count descending.

    Scale notes: orders are aggregated to ``(custkey, count)`` BEFORE
    the join — the left join then carries one narrow row per customer
    and one per ordering customer, never raw order rows; both sides
    shuffle once on the customer key with map-side combine.  The
    outer distribution aggregation is ~max-orders-per-customer rows.
    """
    per_cust = (
        orders.where(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def nation_trade_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between two nations — lines
    whose supplier sits in one nation and whose ordering customer sits
    in the other (both directions), grouped by
    ``(supp_nation, cust_nation, l_year)``.

    Scale notes: one fact-fact shuffle (lineitem⋈orders on the
    orderkey); nation⋈supplier collapses to a broadcast
    ``(s_suppkey, supp_nation)`` dimension filtered to the two nations
    BEFORE broadcasting (so the broadcast is two nations' suppliers,
    not all); customer joins on the custkey before the fact shuffle.
    The cross-direction predicate is applied post-broadcast where both
    nation names are in hand.  The ship-date window is a plain range
    predicate that reaches the parquet scan.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    two = nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    sup = supplier.join(
        F.broadcast(two), supplier["s_nationkey"] == two["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(two), customer["c_nationkey"] == two["n_nationkey"]
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = orders.select("o_orderkey", "o_custkey").join(
        cust, F.col("o_custkey") == cust["c_custkey"]
    ).select("o_orderkey", "cust_nation")
    li = lineitem.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
        ).alias("disc_price"),
    )
    joined = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("disc_price").cast("double"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    date_from: str = "1995-07-01",
    date_to: str = "1995-10-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: the top-k customers by revenue lost to
    returned items (``l_returnflag = 'R'``) in one order-date quarter
    — ``(c_custkey, c_name, n_name, revenue)`` by revenue descending,
    custkey as the deterministic tie-break.

    Scale notes: the return-flag and date predicates are plain scan
    pushdowns on their fact tables; orders⋈lineitem is the one
    fact-fact shuffle; customer joins on the custkey AFTER the
    per-customer revenue is aggregated (the Q13 posture: the join
    carries (custkey, revenue) rows, not fact rows), with the
    nation name riding a broadcast; the top-k is
    ``orderBy().limit(k)`` = TakeOrderedAndProject.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    o = orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_custkey"
    )
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
        ).alias("disc_price"),
    )
    per_cust = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey")
        .agg(F.round(F.sum("disc_price").cast("double"), 4).alias("revenue"))
    )
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select("c_custkey", "c_name", "n_name")
    return (
        per_cust.join(cust, per_cust["o_custkey"] == cust["c_custkey"])
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    date_from: str = "1995-01-01",
    date_to: str = "1995-04-01",
) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in one quarter
    that have at least one returned line (``EXISTS`` rewritten as a
    LEFT SEMI join; the reference schema's commit/receipt-date lateness
    predicate maps to the return flag here).  Returns
    ``(o_orderpriority, order_count)`` ordered by priority.

    Scale notes: the semi join is the whole point — the lineitem side
    is reduced to a bag of qualifying orderkeys (one bigint column,
    duplicates eliminated by the semi-join semantics, never a row
    multiplier), and the return-flag + date predicates are plain scan
    pushdowns.  Both sides shuffle once on the orderkey; the
    aggregation output is 5 rows.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    o = orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_orderpriority"
    )
    flagged = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(flagged, o["o_orderkey"] == flagged["l_orderkey"], "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def shipmode_priority_stats(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    year_from: str = "1996-01-01",
    year_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape: per-lineitem-class counts of high- vs
    low-priority orders shipped in one year (the reference schema's
    ship-mode column maps to ``(l_returnflag, l_linestatus)`` here).
    Returns ``(l_returnflag, l_linestatus, high_count, low_count)``.

    Scale notes: conditional aggregation (SUM of CASE) folds the two
    output measures into ONE pass over the joined rows — no
    self-join, no pivot shuffle.  The ship-date window is a scan
    pushdown on the fact side; orders contributes only
    (orderkey, priority) and joins on the natural key.
    """
    lo = F.lit(year_from).cast("timestamp")
    hi = F.lit(year_to).cast("timestamp")
    li = lineitem.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).select(
        "l_orderkey", "l_returnflag", "l_linestatus"
    )
    o = orders.select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    promo_type: str = "PROMO",
    date_from: str = "1995-09-01",
    date_to: str = "1995-10-01",
) -> DataFrame:
    """TPC-H Q14 shape: the percentage of one month's discounted
    revenue that came from promotional parts — a single-row
    ``(promo_revenue, total_revenue, promo_pct)`` scalar.

    Scale notes: part is reduced to ``(p_partkey, is_promo)`` — one
    bigint + one boolean per part — and broadcast, so the fact scan
    never shuffles; both the numerator and denominator come out of ONE
    conditional aggregation over a single pass (no second scan, no
    self-join).  The month predicate is a scan pushdown.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    li = lineitem.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).select(
        "l_partkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
        ).alias("disc_price"),
    )
    p = part.select(
        "p_partkey", (F.col("p_type") == promo_type).alias("is_promo")
    )
    agg = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.sum(F.when(F.col("is_promo"), F.col("disc_price")).otherwise(
                F.lit(0).cast(_DEC))).alias("promo_dec"),
            F.sum("disc_price").alias("total_dec"),
        )
    )
    return agg.select(
        F.round(F.col("promo_dec").cast("double"), 4).alias("promo_revenue"),
        F.round(F.col("total_dec").cast("double"), 4).alias("total_revenue"),
        F.round(
            (F.lit(100.0) * F.col("promo_dec") / F.col("total_dec")).cast("double"), 4
        ).alias("promo_pct"),
    )


def large_quantity_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    qty_threshold: float = 220.0,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q18 shape: the top-k largest orders by total line
    quantity above a threshold, with their customer — ``(c_custkey,
    c_name, o_orderkey, o_orderdate, total_qty)`` by quantity
    descending, orderkey tie-break.

    Scale notes: the HAVING aggregation runs FIRST — lineitem
    collapses to ``(orderkey, total_qty)`` with map-side combine and
    the threshold then cuts that to a tiny key set, so the orders and
    customer joins carry only qualifying keys (broadcast-eligible
    under AQE: the post-filter side is a few thousand rows at any
    scale where the threshold is selective).  Top-k is
    TakeOrderedAndProject.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty_dec"))
        .where(F.col("qty_dec") > F.lit(qty_threshold).cast(_DEC))
        .select(
            "l_orderkey", F.round(F.col("qty_dec").cast("double"), 4).alias("total_qty")
        )
    )
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    c = customer.select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def disjunctive_part_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    brand_a: str = "Brand#11",
    brand_b: str = "Brand#23",
    brand_c: str = "Brand#34",
) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue over an OR-of-ANDs
    predicate — three (brand, size-range, quantity-range) disjuncts
    that each touch both the part and lineitem side.  Returns a
    single-row ``(revenue, n_lines)``.

    Scale notes: the disjunction splits into a part-side filter
    (brand IN (...) AND the per-brand size window — evaluated before
    the broadcast, so the broadcast table is only matching parts) and
    a residual joined predicate for the per-brand quantity windows.
    The joined filter runs inside the broadcast-hash-join stage —
    zero shuffles end to end (the final agg is a single scalar).
    """
    cond_part = (
        ((F.col("p_brand") == brand_a) & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == brand_b) & F.col("p_size").between(10, 30))
        | ((F.col("p_brand") == brand_c) & F.col("p_size").between(25, 50))
    )
    p = part.where(cond_part).select("p_partkey", "p_brand")
    li = lineitem.select(
        "l_partkey",
        "l_quantity",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
        ).alias("disc_price"),
    )
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).where(
        ((F.col("p_brand") == brand_a) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == brand_b) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == brand_c) & F.col("l_quantity").between(20, 45))
    )
    return joined.agg(
        F.round(F.sum("disc_price").cast("double"), 4).alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


def forecast_revenue(
    lineitem: DataFrame,
    *,
    date_from: str = "1995-01-01",
    date_to: str = "1996-01-01",
    discount_lo: str = "0.05",
    discount_hi: str = "0.07",
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: forecast revenue change — one decimal-exact
    aggregate over a four-predicate lineitem scan, NO joins.  The
    point of the shape is the plan: every predicate (ship-date range,
    discount band, quantity cap) reaches the parquet scan as a pushed
    filter, so at 100 TB this is a pure min/max-pruned columnar scan
    plus a map-side-combined one-row aggregation.
    """
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (disc >= F.lit(discount_lo).cast(_DEC))
        & (disc <= F.lit(discount_hi).cast(_DEC))
        & (F.col("l_quantity") < max_qty)
    )
    return li.agg(
        F.round(F.sum(price * disc).cast("double"), 4).alias("revenue")
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, *, brand: str = "Brand#23"
) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders of a brand's parts were dropped — the correlated scalar
    subquery ``l_quantity < 0.2 * avg(l_quantity per part)`` rewritten
    as a per-part pre-aggregation joined back (Catalyst's decorrelated
    form, stated explicitly).  The comparison is CROSS-MULTIPLIED to
    decimal-exact arithmetic (``qty * 5 * cnt < sum_qty``, 0.2 = 1/5)
    so no division — and no engine-dependent rounding — enters the
    predicate; the one division (by 7 years) happens after the double
    cast of the exact decimal sum.

    Scale: the brand filter broadcasts (~1/25 of parts), the
    per-part aggregation rides the SAME brand-filtered join output,
    and both sides of the final join are brand-sized, never
    lineitem-sized.
    """
    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = (
        lineitem.join(F.broadcast(p), lineitem["l_partkey"] == p["p_partkey"])
        .select(
            "l_partkey",
            F.col("l_quantity").cast(_DEC).alias("q"),
            F.col("l_extendedprice").cast(_DEC).alias("price"),
        )
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("q").alias("sq"), F.count("*").alias("cnt")
    )
    small = li.join(per_part, "l_partkey").where(
        F.col("q") * 5 * F.col("cnt") < F.col("sq")
    )
    return small.agg(
        F.round(F.sum("price").cast("double") / 7.0, 4).alias("avg_yearly")
    )


def nation_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    *,
    target_nation: str = "NATION_7",
    region_name: str = "EUROPE",
    part_type: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue for a
    part type, per order year — ``(o_year, mkt_share)``.

    Scale notes: part (type filter), supplier⋈nation (supplier
    nation name), and region⋈nation⋈customer's nation keyset are all
    dimension-sized broadcasts; the only fact-fact shuffle is
    orders⋈lineitem on the orderkey.  Customer joins on o_custkey
    BEFORE that shuffle so disqualified orders never move.  Both the
    numerator (target-nation revenue) and denominator come out of ONE
    conditional aggregation per year — no second pass, no self-join.
    Share = exact decimal sums, divided once as doubles, rounded.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    nat_in_region = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(nat_in_region),
        customer["c_nationkey"] == nat_in_region["n_nationkey"],
    ).select("c_custkey")
    o = orders.where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    oc = o.join(cust, o["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "o_year"
    )
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    p = part.where(F.col("p_type") == part_type).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), lineitem["l_partkey"] == p["p_partkey"]
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
        ).alias("disc_price"),
    )
    joined = (
        oc.join(li, oc["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == target_nation, F.col("disc_price"))
            .otherwise(F.lit(0).cast(_DEC))
        ).alias("nation_dec"),
        F.sum("disc_price").alias("total_dec"),
    )
    # Double-cast BEFORE dividing: decimal/decimal division widens the
    # scale differently per engine; double/double is one IEEE op both
    # engines round identically.
    return agg.select(
        F.col("o_year").cast("int").alias("o_year"),
        F.round(
            F.col("nation_dec").cast("double") / F.col("total_dec").cast("double"),
            6,
        ).alias("mkt_share"),
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly discounted
    revenue equals the maximum — the revenue "view" materialized as a
    per-supplier aggregation, its scalar max broadcast back as a
    filter.  Returns ``(s_suppkey, s_name, total_revenue)``.

    Scale notes: one shuffle builds the per-supplier revenue
    (supplier-cardinality output); the max is a one-row aggregate of
    THAT, cross-broadcast into the equality filter — the fact table
    is scanned once, the predicate on the quarter is a pushdown, and
    equality on the EXACT decimal sum (not the rounded double) keeps
    tie membership engine-portable.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    rev = (
        lineitem.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (1 - F.col("l_discount").cast(_DEC))
            ).alias("rev_dec")
        )
    )
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    top = rev.join(F.broadcast(mx), rev["rev_dec"] == mx["max_dec"]).select(
        "l_suppkey", "rev_dec"
    )
    return (
        top.join(
            supplier.select("s_suppkey", "s_name"),
            top["l_suppkey"] == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.round(F.col("rev_dec").cast("double"), 4).alias("total_revenue"),
        )
    )


def waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "NATION_3",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q21 shape (adapted: the testdata lineitem carries no
    commit/receipt dates, so "late" is ``l_shipdate > o_orderdate +
    late_days``): suppliers in one nation who were the ONLY late
    supplier on a multi-supplier finished order.  Returns
    ``(s_name, numwait)``.

    The double correlation — EXISTS another supplier's line, NOT
    EXISTS another supplier's LATE line — is rendered as its
    decorrelated join form: a per-order aggregate counting distinct
    suppliers and distinct LATE suppliers, joined once.  That turns
    two correlated subqueries into ONE extra aggregation over the
    already-shuffled fact (orderkey-keyed, the same key as the main
    join — no additional shuffle pattern), and the semi/anti logic
    into integer predicates ``n_supps > 1 AND n_late_supps = 1``.

    Scale notes: orders('F') joins the fact on the orderkey before
    anything else; nation and the supplier dim broadcast; everything
    downstream of the fact shuffle is per-order/per-supplier sized.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {int(late_days)} DAYS"
    )
    of = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(of, li["l_orderkey"] == of["o_orderkey"]).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supps"),
    )
    nat = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    sup = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", "s_name")
    blamed = (
        lo.where(F.col("is_late"))
        .join(
            per_order.where(
                (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)
            ),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
    )
    return blamed.groupBy("s_name").agg(
        F.count("*").cast("long").alias("numwait")
    )


def idle_customers(
    customer: DataFrame,
    orders: DataFrame,
    *,
    nation_keys: tuple = (1, 3, 5, 7, 9, 11, 13),
    since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22 shape (adapted: the testdata customer carries no
    phone, so the country-code substring becomes a nation-key set,
    and — because every testdata customer has ordered at least once —
    "never ordered" becomes Q22's stated business question, "no order
    in the recent window": no order since ``since``): per nation key,
    the count and account-balance total of LAPSED customers with
    above-average positive balances.  Returns
    ``(cntry, numcust, totacctbal)``.

    Scale notes: the positive-balance total is a one-row aggregate
    broadcast into a CROSS-MULTIPLIED above-average predicate (bal *
    n > sum — decimal-exact, no division); the lapsed test is a LEFT
    ANTI join against the DISTINCT recent-order custkeys (date
    predicate pushed to the orders scan, anti side custkey-sized);
    the final rollup is nation-cardinality.  Balance sums are exact
    decimals, rounded once at the edge.
    """
    cs = customer.where(
        F.col("c_nationkey").isin(*[int(k) for k in nation_keys])
    ).select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast(_DEC).alias("bal")
    )
    # Cross-multiplied above-average predicate (bal * n > sum), so the
    # comparison is decimal-exact and engine-portable — no division
    # enters the predicate (the small_quantity_revenue rule).
    pos = cs.where(F.col("bal") > 0).agg(
        F.sum("bal").alias("sum_bal"), F.count("*").alias("n_pos")
    )
    rich = cs.join(
        F.broadcast(pos), cs["bal"] * F.col("n_pos") > F.col("sum_bal")
    )
    recent = (
        orders.where(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    never_ordered = rich.join(
        recent, rich["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    return never_ordered.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("numcust"),
        F.round(F.sum("bal").cast("double"), 4).alias("totacctbal"),
    ).select(F.col("c_nationkey").cast("int").alias("cntry"), "numcust", "totacctbal")


def order_gap_stats(orders: DataFrame) -> DataFrame:
    """Per-customer purchase cadence via LAG: the day gaps between a
    customer's consecutive orders (ordered by date, orderkey-tied),
    aggregated to ``(custkey, n_gaps, total_gap_days, max_gap_days)``
    for customers with at least two orders.  All-integer measures, so
    the value oracle is exact.

    The cadence profile is the classic churn/recency feature a
    training-data pipeline derives from event logs.  Scale: ONE
    shuffle on the customer key serves both the lag window and the
    aggregation (same partitioning, no second exchange); day diffs
    are computed inside the window projection, JVM-side.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("total_gap_days"),
        F.max("gap").cast("long").alias("max_gap_days"),
    ).select(
        F.col("o_custkey").cast("long").alias("custkey"),
        "n_gaps",
        "total_gap_days",
        "max_gap_days",
    )


def funnel_stages(
    events: DataFrame,
    *,
    stages: tuple = ("signup", "view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel conversion: a user reaches stage i iff they have
    a stage-i event STRICTLY AFTER their stage-(i-1) entry time, where
    the entry time is the FIRST qualifying event (min ts) — the
    classic product-analytics sequence query.  Returns one row per
    stage: ``(stage_no, stage, n_users)``, exact integer counts.

    Scale notes: each stage is a user-keyed min-aggregation joined to
    the (shrinking) previous stage's entry table — the stage table is
    user-cardinality, dimension-sized next to the event fact, and is
    broadcast; the event scan carries a pushed event_type predicate
    per stage.  The per-stage count rows are one-row aggregates
    unioned together (k rows total).  No window over the raw fact, no
    per-user sort.
    """
    out = None
    cur = None
    for i, s in enumerate(stages):
        ev = events.where(F.col("event_type") == s).select("user_id", "ts")
        if cur is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            prev = cur.select("user_id", F.col("t").alias("prev_t"))
            cur = (
                ev.join(F.broadcast(prev), "user_id")
                .where(F.col("ts") > F.col("prev_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        row = cur.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("int").alias("stage_no"),
            F.lit(s).alias("stage"),
            "n_users",
        )
        out = row if out is None else out.unionAll(row)
    return out


def retention_cohorts(events: DataFrame, *, signup_type: str = "signup") -> DataFrame:
    """Weekly retention cohort matrix: users grouped by the ISO week
    of their FIRST signup event, counted as retained in week-offset
    ``(activity_date - signup_date) DIV 7`` for every week in which
    they have any event at or after signup.  Returns
    ``(cohort_week, week_offset, n_users)`` — the classic
    product-analytics retention triangle, all-integer counts.

    Scale notes: the signup table is user-cardinality and broadcast
    against the event fact; the distinct on (cohort, offset, user)
    carries bare ids + small ints; integral DIV (not float division)
    keeps the offset engine-exact.
    """
    signup = (
        events.where(F.col("event_type") == signup_type)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    act = events.select("user_id", "ts").join(
        F.broadcast(signup), "user_id"
    ).where(F.col("ts") >= F.col("t0"))
    cells = act.select(
        F.to_date(F.date_trunc("week", F.col("t0"))).alias("cohort_week"),
        F.expr("CAST(datediff(ts, t0) DIV 7 AS INT)").alias("week_offset"),
        "user_id",
    ).distinct()
    return cells.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("n_users")
    )


def gini_concentration(orders: DataFrame, *, n_blocks: int = 32, scale: int = 10**6) -> DataFrame:
    """Gini coefficient of per-customer spend — the revenue-
    concentration / inequality readout (`G = (2*SUM(i*x_i) -
    (n+1)*S) / (n*S)` over ascending-sorted spends, the standard
    rank formula), integer-scaled to ppm so both engines replay it
    exactly.  Returns ONE row ``(n_customers, total_cents,
    gini_ppm)``.

    Scale notes: the global ascending rank comes from
    ``blocked_global_rank`` (two-pass value-range blocks — a bare
    global row_number would put every customer in one task); ties
    broken by customer id, so the rank — and therefore the sum — is
    deterministic.  ``SUM(i * cents)`` needs headroom: BIGINT is
    fine through ~1e8 customers x 1e8 cents; beyond that cast the
    product to DECIMAL(38,0) — same algebra.
    """
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    spend = orders.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    ranked = blocked_global_rank(spend, "cents", "o_custkey", n_blocks=n_blocks)
    return ranked.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        # DECIMAL(38,0) numerator: SUM(i*cents) fits BIGINT, but the
        # * scale step does not (measured overflow at sf0.01) — both
        # engines do the widened floor-division exactly (HUGEINT on
        # the DuckDB side).
        F.expr(
            f"CAST((CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents) "
            f"AS DECIMAL(38,0)) * {int(scale)}) "
            f"div (COUNT(*) * SUM(cents)) AS LONG)"
        ).alias("gini_ppm"),
    )


def association_rules(
    facts: DataFrame,
    group_col: str,
    item_col: str,
    *,
    max_group: int | None = 12,
    min_pair_count: int = 3,
    scale: int = 10**6,
) -> DataFrame:
    """Market-basket association rules for 2-itemsets — the classic
    support / confidence / lift mining query (the k=2 core of
    FP-growth, which covers the overwhelming share of real basket
    insight): for each ordered item pair (a -> b) co-occurring in at
    least ``min_pair_count`` groups, the co-occurrence support, the
    antecedent's group count, and integer-scaled confidence
    ``cnt * scale div n(a)`` and lift ``cnt * N * scale div
    (n(a) * n(b))``.  All-integer, so any SQL engine replays the
    measures exactly.  Returns ``(ante, cons, pair_cnt, n_ante,
    conf_ppm, lift_ppm)``.

    Scale notes: pairs come from the single-scan basket-explosion
    (``cooccurrence_pairs`` — collect_set + JVM-side sorted-array
    explode, degenerate baskets dropped BEFORE the quadratic step);
    item counts are one distinct + map-side-combined count; the group
    total N is a one-row broadcast (the corpus-stats crossJoin idiom);
    the min-support filter prunes the rule set before the two
    dimension joins.  Lift's ``cnt * N * scale`` product needs
    headroom: fine in BIGINT through ~1e9 groups; beyond that switch
    the expression to DECIMAL(38,0) — same algebra.
    """
    from ..sources.graphs import cooccurrence_pairs

    g, i = F.col(group_col), F.col(item_col)
    li = facts.select(g.alias("g"), i.cast("long").alias("p")).distinct()
    sized = (
        li.groupBy("g").agg(F.count("*").alias("sz"))
    )
    if max_group is not None:
        sized = sized.where(F.col("sz") <= int(max_group))
    li2 = li.join(sized.select("g"), "g", "left_semi")
    n_item = li2.groupBy("p").agg(F.count("*").cast("long").alias("n"))
    n_groups = sized.agg(F.count("*").cast("long").alias("N"))
    pairs = (
        cooccurrence_pairs(facts, group_col, item_col, max_group=max_group)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= int(min_pair_count))
    )
    both = pairs.select(
        F.col("src").alias("ante"), F.col("dst").alias("cons"), "cnt"
    ).unionAll(
        pairs.select(F.col("dst").alias("ante"), F.col("src").alias("cons"), "cnt")
    )
    na = n_item.select(F.col("p").alias("ante"), F.col("n").alias("n_ante"))
    nb = n_item.select(F.col("p").alias("cons"), F.col("n").alias("n_cons"))
    return (
        both.join(na, "ante")
        .join(nb, "cons")
        .crossJoin(F.broadcast(n_groups))
        .select(
            "ante",
            "cons",
            F.col("cnt").alias("pair_cnt"),
            "n_ante",
            F.expr(f"CAST(cnt * {int(scale)} div n_ante AS LONG)").alias(
                "conf_ppm"
            ),
            F.expr(
                f"CAST(cnt * N * {int(scale)} div (n_ante * n_cons) AS LONG)"
            ).alias("lift_ppm"),
        )
    )


def skyline_2d(
    df: DataFrame,
    *,
    maximize: str,
    minimize: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): the rows not strictly dominated
    under (``maximize`` higher-is-better, ``minimize`` lower-is-better)
    — row a is dominated iff some b has ``b.max >= a.max AND b.min <=
    a.min`` with at least one strict.  Ties on the frontier are all
    kept (the NOT-EXISTS semantics).  Returns the qualifying input
    rows unchanged.

    Scale notes — the two-phase distributed skyline, NEVER the naive
    all-pairs dominance join: phase 1 collapses each ``maximize``
    value to its min-``minimize`` via one map-side-combined groupBy
    (candidates <= distinct maximize values; for an unbounded
    continuous dimension, range-bucketize first — same algebra per
    bucket); phase 2 prunes candidates against each other with a
    BROADCAST anti-join on the strict-dominance predicate (the
    candidate set is dimension-sized); phase 3 semi-joins the fact
    rows back on the (max, min) frontier points.  No window, no
    global sort, no self-join of the fact table.
    """
    s = F.col(maximize)
    m = F.col(minimize)
    mins = df.groupBy(s.alias("_sky_s")).agg(F.min(m).alias("_sky_m"))
    a = mins.select(F.col("_sky_s").alias("_a_s"), F.col("_sky_m").alias("_a_m"))
    b = mins.select(F.col("_sky_s").alias("_b_s"), F.col("_sky_m").alias("_b_m"))
    frontier = a.join(
        F.broadcast(b),
        (F.col("_b_s") > F.col("_a_s")) & (F.col("_b_m") <= F.col("_a_m")),
        "left_anti",
    )
    return df.join(
        F.broadcast(frontier),
        (s == F.col("_a_s")) & (m == F.col("_a_m")),
        "left_semi",
    )


def event_transitions(events: DataFrame, *, scale: int = 10**6) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each ordered pair of consecutive events of the same
    user (ordered by ``(ts, event_id)`` — the id tie-break keeps the
    sequence deterministic under equal timestamps), the transition
    count and the integer-scaled transition probability
    ``n * scale div row_total`` — the behavioral-model fitting query.
    Returns ``(from_type, to_type, n, p_scaled)``.

    Scale notes: the LEAD window is keyed on ``user_id`` — true
    user-grained parallelism, bounded rows per key (never a
    bounded-cardinality partition key carrying unbounded rows); the
    transition matrix itself is |types|^2 rows, and the per-row totals
    join is a broadcast of that tiny aggregate.  Integer ``div`` keeps
    probabilities engine-exact.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr(f"CAST(n * {int(scale)} div tot AS LONG)").alias("p_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# The last five TPC-H shapes (Q2, Q9, Q11, Q16, Q20).  The driver's
# testdata has no partsupp table, so all five derive the supply
# relation from lineitem: a (partkey, suppkey) pair "supplies" iff a
# line ships it, and its supply COST is the cheapest line price ever
# observed for the pair (an exact decimal MIN — deterministic and
# engine-portable, unlike any averaged unit price, which would need a
# division).  Same adaptation posture as waiting_suppliers (Q21,
# no commit/receipt dates) and idle_customers (Q22, no phone).
# ---------------------------------------------------------------------------


def derived_supply(lineitem: DataFrame) -> DataFrame:
    """The partsupp stand-in: per observed ``(l_partkey, l_suppkey)``
    pair, the minimum line price as exact ``cost_dec``.

    Scale: ONE shuffle on the composite (partkey, suppkey) key with a
    map-side partial MIN, output bounded by |part|x|supplier| — the
    same cardinality partsupp itself would have.
    """
    return lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(_DEC)).alias("cost_dec")
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    *,
    region_name: str = "EUROPE",
    size_lo: int = 10,
    size_hi: int = 20,
) -> DataFrame:
    """TPC-H Q2 shape: for each mid-size part, the region supplier(s)
    offering the MINIMUM derived supply cost — the correlated
    min-subquery decorrelated into a per-part aggregate joined back on
    exact decimal equality (ties all kept, as in Q2).  Returns
    ``(s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost)``.

    Scale notes: the only fact-sized work is derived_supply's one
    composite-key shuffle; part (size filter), the supplier⋈nation⋈
    region chain, and the per-part min (part-cardinality) are all
    broadcast.  The min join-back compares the EXACT decimal, never a
    rounded double, so tie membership is engine-portable.
    """
    sup = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey", "n_name")
            ),
            supplier["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = part.where(
        (F.col("p_size") >= size_lo) & (F.col("p_size") <= size_hi)
    ).select("p_partkey", "p_brand")
    cand = (
        derived_supply(lineitem)
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
    )
    min_cost = cand.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("cost_dec").alias("min_cost_dec")
    )
    return (
        cand.join(
            F.broadcast(min_cost),
            (cand["p_partkey"] == F.col("mc_partkey"))
            & (cand["cost_dec"] == F.col("min_cost_dec")),
        )
        .select(
            F.round(F.col("s_acctbal").cast(_DEC).cast("double"), 2).alias(
                "s_acctbal"
            ),
            "s_name",
            "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_brand",
            F.round(F.col("cost_dec").cast("double"), 2).alias("supply_cost"),
        )
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    name_token: str = "blue",
) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    order year — ``(nation, o_year, sum_profit)``.  The testdata's
    supply-cost stand-in is the part's retail price: profit per line =
    ``extendedprice*(1-discount) - quantity*p_retailprice`` (may be
    negative — discounts below list price), all exact decimals.

    Scale notes: the part filter (name token) broadcasts with the
    retail price attached so the per-line amount is computed BELOW the
    orders join; supplier⋈nation broadcasts; the only fact-fact
    shuffle is lineitem⋈orders on the orderkey.  One aggregation on
    the (nation, year) pair — nation x years output.
    """
    p = part.where(F.col("p_name").contains(name_token)).select(
        "p_partkey", F.col("p_retailprice").cast(_DEC).alias("retail_dec")
    )
    li = lineitem.join(
        F.broadcast(p), lineitem["l_partkey"] == p["p_partkey"]
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_extendedprice").cast(_DEC)
            * (1 - F.col("l_discount").cast(_DEC))
            - F.col("l_quantity").cast(_DEC) * F.col("retail_dec")
        ).alias("amount_dec"),
    )
    o = orders.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("nation", "o_year")
        .agg(F.sum("amount_dec").alias("profit_dec"))
        .select(
            "nation",
            F.col("o_year").cast("int").alias("o_year"),
            F.round(F.col("profit_dec").cast("double"), 4).alias("sum_profit"),
        )
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    mult: int = 2,
) -> DataFrame:
    """TPC-H Q11 shape: the parts whose share of one region's total
    derived supply value exceeds ``mult`` times the average part's
    share — the correlated HAVING-over-global-scalar decorrelated
    into a one-row broadcast.  Returns ``(p_partkey, value)``.
    (Q11's literal ``0.0001/SF`` cutoff is scale-dependent by
    construction; the multiple-of-average form keeps the identical
    plan shape while selecting a stable head at every SF.)

    Scale notes: supplier⋈nation⋈region broadcasts into the lineitem
    scan; one partkey-keyed aggregation builds the per-part value;
    the global (total, n_parts) pair is a one-row aggregate
    cross-broadcast into the share predicate.  The predicate is
    integer-exact: values become BIGINT cents (scale-2 decimals times
    100 cast losslessly), cross-multiplied — ``value * n_parts >
    mult * total`` — so no division and no decimal-widening rules
    enter the comparison (the idle_customers rule).
    """
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey")
    sup = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey")
    li = lineitem.join(
        F.broadcast(sup), lineitem["l_suppkey"] == sup["s_suppkey"]
    )
    value = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_extendedprice").cast(_DEC)) * 100)
        .cast("long")
        .alias("value_cents")
    )
    total = value.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count("*").alias("n_parts"),
    )
    return (
        value.join(
            F.broadcast(total),
            F.col("value_cents") * F.col("n_parts")
            > F.col("total_cents") * mult,
        )
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            F.round(F.col("value_cents") / 100.0, 2).alias("value"),
        )
    )


def supplier_part_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    *,
    excl_brand: str = "Brand#13",
    excl_type: str = "PROMO",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can supply each
    surviving (brand, type, size) bucket, excluding "complaint"
    suppliers — ``(p_brand, p_type, p_size, supplier_cnt)``.  The
    testdata supplier has no comment column, so the complaint proxy is
    a deterministic name pattern (``s_name`` ending in '7').

    Scale notes: the supply pairs are the DISTINCT projection of two
    fact columns (one composite-key shuffle, partsupp-cardinality
    output); the excluded-supplier set and the filtered part dim are
    broadcast (anti and inner respectively); the final count-distinct
    aggregates the pair table on the bucket key.
    """
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.where(F.col("s_name").endswith("7")).select("s_suppkey")
    p = part.where(
        (F.col("p_brand") != excl_brand)
        & (F.col("p_type") != excl_type)
        & F.col("p_size").isin(*[int(s) for s in sizes])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(
            F.broadcast(bad),
            pairs["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("int").alias("p_size"),
            F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
        )
    )


def promo_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    name_prefix: str = "blue",
    region_name: str = "ASIA",
    date_from: str = "1995-01-01",
    date_to: str = "1996-01-01",
) -> DataFrame:
    """TPC-H Q20 shape: region suppliers who shipped MORE THAN HALF of
    their all-time volume of a promoted part line during the campaign
    year — the nested EXISTS chain (supplier -> partsupp -> part +
    correlated lineitem sum) decorrelated into one conditional
    aggregation and a semi join.  Returns ``(s_suppkey, s_name,
    n_name)``.  (The classic availqty > 0.5*shipped test becomes
    campaign-share > 0.5 of the pair's total shipped quantity — the
    same correlated-half comparison the testdata can express without
    an availqty column.)

    Scale notes: the promoted-part filter broadcasts into the fact
    scan; ONE pass over the surviving lines computes both the
    campaign-window and all-time quantity sums per (supplier, part)
    pair (conditional aggregation — no second scan, no self-join);
    the half test is decimal-exact cross-multiplication (2*q95 >
    qall); qualifying suppkeys collapse to a DISTINCT set that joins
    the region supplier dim as a broadcast LEFT SEMI.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    p = part.where(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    q = F.col("l_quantity").cast(_DEC)
    sums = (
        lineitem.join(F.broadcast(p), lineitem["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(
                    (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi), q
                ).otherwise(F.lit(0).cast(_DEC))
            ).alias("qty_window"),
            F.sum(q).alias("qty_all"),
        )
    )
    qual = (
        sums.where(2 * F.col("qty_window") > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    sup = supplier.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.where(F.col("r_name") == region_name)),
                nation["n_regionkey"] == region["r_regionkey"],
            ).select("n_nationkey", "n_name")
        ),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    return sup.join(
        F.broadcast(qual),
        sup["s_suppkey"] == qual["l_suppkey"],
        "left_semi",
    ).select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "n_name")


def order_cube(orders: DataFrame) -> DataFrame:
    """Full CUBE over (priority, order year): all four grains — leaf
    grid, per-priority, per-year, grand total — in ONE map-side-
    combined shuffle.  Completes the multi-grain family next to
    ``revenue_rollup`` (hierarchical) and ``revenue_grouping_sets``
    (arbitrary sets): CUBE is the power-set sugar.

    Scale: identical to ROLLUP — each input row expands to the 4
    grouping-set rows BEFORE the exchange and partial aggregation
    collapses them per map task, so the shuffle carries (sets x
    groups) rows, not (sets x input).  ``gid`` (grouping_id bitmask)
    disambiguates subtotal rows from leaf rows whose key is NULL.
    """
    base = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.col("o_totalprice").cast(_DEC).alias("price"),
    )
    return base.cube("priority", "o_year").agg(
        F.round(F.sum("price").cast("double"), 4).alias("revenue"),
        F.count("*").cast("long").alias("n_orders"),
        F.grouping_id().cast("int").alias("gid"),
    )


def event_sequences(events: DataFrame, *, scale: int = 10**6) -> DataFrame:
    """Frequent contiguous 3-event sequences (sequential-pattern /
    clickstream-motif mining, one order up from ``event_transitions``'
    first-order pairs): two window LEADs over each user's timeline,
    global counts, and integer support ppm against the total motif
    count.

    Ordering ties are broken by ``event_id`` so the motif multiset is
    deterministic under any partitioning.  Scale: ONE exchange on
    ``user_id`` (bounded rows per user) serves the window; the count
    aggregation is map-side combined into at most |types|^3 groups,
    and the one-row total is broadcast — no second scan, no global
    window.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    counts = seq.groupBy("e1", "e2", "e3").agg(
        F.count("*").cast("long").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("_tot"))
    return counts.join(F.broadcast(total)).select(
        "e1",
        "e2",
        "e3",
        "cnt",
        F.expr(f"CAST(cnt * {int(scale)} DIV _tot AS LONG)").alias("support_ppm"),
    )


def blocked_global_rank(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    *,
    n_blocks: int = 32,
) -> DataFrame:
    """Global ascending dense 1-based ROW_NUMBER over ``(value_col,
    tie_col)`` WITHOUT a single-partition window: deterministic
    value-range blocks (integral DIV off the min/max bounds — no
    sampling pass), per-block local ranks (~n/n_blocks rows per window
    partition), and block offsets from a metadata window over
    ``n_blocks`` count rows.  The ``bfs_level_order`` idiom, shared by
    ``gini_concentration`` and ``decile_table``.

    Returns the input columns plus ``i`` (the global rank).  The
    bounds read is one 2-column min/max action — at 100 TB that is a
    map-side-combined scan, the price of not sampling; skewed value
    ranges degrade block balance but never correctness (ties split by
    ``tie_col`` inside a block, and equal values always land in the
    same block).
    """
    bounds = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).first()
    lo = bounds["lo"] if bounds["lo"] is not None else 0
    hi = bounds["hi"] if bounds["hi"] is not None else 0
    width = max(1, (int(hi) - int(lo) + n_blocks) // n_blocks)
    blocked = df.withColumn(
        "_blk", F.expr(f"({value_col} - {int(lo)}L) DIV {int(width)}L")
    )
    local = blocked.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_blk").orderBy(value_col, tie_col)
        ),
    )
    boff = (
        blocked.groupBy("_blk")
        .agg(F.count("*").alias("_n"))
        .select(
            "_blk",
            F.sum("_n")
            .over(
                Window.orderBy("_blk").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("_boff"),
        )
        .fillna({"_boff": 0})
    )
    return (
        local.join(boff, "_blk")
        .withColumn("i", F.col("_rn") + F.col("_boff"))
        .drop("_blk", "_rn", "_boff")
    )


def decile_table(orders: DataFrame, *, n_buckets: int = 10) -> DataFrame:
    """Global spend deciles: per-customer spend ranked ascending over
    the whole population, cut into ``n_buckets`` equal-count buckets
    (``(i-1)*k DIV n`` — NTILE's arithmetic without NTILE's
    single-partition global window), with per-bucket count / total /
    min / max cents.

    The distribution readout behind "top decile holds X% of revenue"
    — the bucketed companion of ``gini_concentration``'s scalar.
    Scale: the rank comes from ``blocked_global_rank`` (two bounded
    windows, no global sort); the one-row population count is
    broadcast; the final aggregation has ``n_buckets`` groups.
    """
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    spend = orders.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    ranked = blocked_global_rank(spend, "cents", "o_custkey")
    n = spend.agg(F.count("*").alias("_n"))
    return (
        ranked.join(F.broadcast(n))
        .withColumn(
            "decile",
            F.expr(f"CAST((i - 1) * {int(n_buckets)} DIV _n AS INT)"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )


def spend_outliers(
    orders: DataFrame,
    *,
    min_orders: int = 5,
    z_threshold: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """Per-customer z-score anomaly detection over order spend: flag
    orders whose total is >= ``z_threshold`` population standard
    deviations from that customer's own mean (the per-entity outlier
    sweep a data-quality pipeline runs before training on transaction
    streams).

    Cross-engine exactness: with integer cents y and per-customer
    exact sums S = sum(y), SS = sum(y^2) over n orders,

        z = (n*y - S) / sqrt(n*SS - S^2)     (algebraic identity)

    and the FLAG is evaluated without any float at all:
    |z| >= t  <=>  (n*y - S)^2 >= t^2 * (n*SS - S^2) — a pure BIGINT
    comparison, so the flagged row set cannot drift across engines
    from a float boundary; only the reported z value itself touches
    doubles (exact-integer inputs -> IEEE sqrt/divide -> round).

    Scale posture: one groupBy(custkey) for the moments (map-side
    combined), one 1:1 join back on the grouping key (AQE reuses the
    partitioning), no window over unbounded partitions, output is the
    outlier rows only.  Headroom: BIGINT holds (n*y - S)^2 through
    ~1e9-cent orders at n ~ 1e2; past that, the same algebra in
    DECIMAL(38,0) (the gini_concentration idiom).

    Returns ``(o_custkey, o_orderkey, cents, n_orders, z)`` for
    flagged orders with at least ``min_orders`` orders behind the
    estimate (small-n z-scores are noise).
    """
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    rows = orders.select("o_custkey", "o_orderkey", cents.alias("cents"))
    mom = rows.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    j = rows.join(mom, "o_custkey")
    num = F.col("n") * F.col("cents") - F.col("s")
    den = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    t2 = int(z_threshold) * int(z_threshold)
    return (
        j.where(F.col("n") >= int(min_orders))
        .where(den > 0)
        .where(num * num >= F.lit(t2) * den)
        .select(
            "o_custkey",
            "o_orderkey",
            "cents",
            F.col("n").cast("long").alias("n_orders"),
            F.round(
                num.cast("double") / F.sqrt(den.cast("double")), round_digits
            ).alias("z"),
        )
    )


def revenue_trend(orders: DataFrame, *, scale: int = 10**6) -> DataFrame:
    """Closed-form OLS trend of daily revenue — the slope/intercept
    fit a forecasting pipeline reads off the fact table (y = cents of
    revenue per day, x = days since 1992-01-01).  All moments are
    exact integers; the line is reported as sign-safe integer
    renderings (the degree_assortativity contract — integral div of
    non-negatives only, so truncate-vs-floor never disagrees across
    engines; the raw rational stays DECIMAL-internal because n*Sxy
    outgrows BIGINT one scale factor up):

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)   [cents/day]
        intercept = (Sy*den - num*Sx) / (n*den)        [cents]

    Scale posture: one groupBy(day) (map-side combined; day count is
    bounded by the calendar, not the data), one single-row global
    aggregate.  The cross products overflow BIGINT at gate scale
    already (n*Sxy ~ 1e19), so the algebra runs in DECIMAL(38,0)
    end-to-end — exact in both engines (HUGEINT on the DuckDB side).

    Returns ONE row ``(n_days, slope_ppm_cents_per_day,
    intercept_cents)``.
    """
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    daily = (
        orders.select(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias("x"),
            cents.alias("y"),
        )
        .groupBy("x")
        .agg(F.sum("y").alias("y"))
    )
    sums = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
    )
    return sums.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * sxy "
            "- CAST(sx AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))"
        ).alias("_num"),
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * sxx "
            "- CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))"
        ).alias("_den"),
        F.col("sx").cast("long").alias("_sx"),
        F.col("sy").cast("long").alias("_sy"),
    ).select(
        "n_days",
        F.expr(
            f"CAST(CASE WHEN _num >= 0 "
            f"THEN (_num * {int(scale)}) DIV _den "
            f"ELSE -((-_num * {int(scale)}) DIV _den) END AS LONG)"
        ).alias("slope_ppm_cents_per_day"),
        F.expr(
            "CAST(CASE WHEN CAST(_sy AS DECIMAL(38,0)) * _den - _num * _sx >= 0 "
            "THEN (CAST(_sy AS DECIMAL(38,0)) * _den - _num * _sx) "
            "DIV (CAST(n_days AS DECIMAL(38,0)) * _den) "
            "ELSE -((-(CAST(_sy AS DECIMAL(38,0)) * _den - _num * _sx)) "
            "DIV (CAST(n_days AS DECIMAL(38,0)) * _den)) END AS LONG)"
        ).alias("intercept_cents"),
    )


def integrity_audit(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Referential-integrity audit — the pre-training data-quality
    sweep: for each foreign-key relation, how many child rows point
    at a missing parent (orphans), alongside the checked row count.
    A healthy warehouse reports zeros; the query exists so a broken
    ingest is a diff in a dashboard row, not a silent join loss
    downstream.

    Scale posture: each check is ONE left-anti join on the key —
    dimension parents (customer/part/nation) broadcast; the one
    fact-fact check (lineitem->orders) shuffles on orderkey exactly
    like the TPC-H joins that key already serves.  Output is one row
    per relation.

    Returns ``(relation, n_rows, n_orphans)`` sorted by relation.
    """
    checks = [
        (
            "customer.nationkey->nation",
            customer,
            "c_nationkey",
            nation,
            "n_nationkey",
        ),
        ("lineitem.orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
        ("lineitem.partkey->part", lineitem, "l_partkey", part, "p_partkey"),
        ("orders.custkey->customer", orders, "o_custkey", customer, "c_custkey"),
        (
            "supplier.nationkey->nation",
            supplier,
            "s_nationkey",
            nation,
            "n_nationkey",
        ),
    ]
    out = None
    for name, child, ck, parent, pk in checks:
        orphans = child.join(
            parent.select(pk), child[ck] == parent[pk], "left_anti"
        )
        row = child.agg(F.count("*").alias("n_rows")).crossJoin(
            orphans.agg(F.count("*").alias("n_orphans"))
        ).select(
            F.lit(name).alias("relation"),
            F.col("n_rows").cast("long"),
            F.col("n_orphans").cast("long"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def event_contingency(events: DataFrame) -> DataFrame:
    """Chi-square contingency table of event type x day-of-week —
    the independence check behind "is usage pattern uniform across
    the week?".  Every reported number is an INTEGER so the table
    cannot drift across engines: expected counts and per-cell
    chi-square contributions are scaled ppm via integral division of
    non-negative DECIMAL(38,0) products (the float chi-square would
    be an unordered sum — banned by the bm25 fixed-order rule; here
    the per-cell rows ARE the statistic, and any consumer can sum the
    integer contribs in whatever order it likes).

    dow is 0=Sunday..6=Saturday (Spark ``dayofweek()-1``, equal to
    DuckDB/Postgres ``date_part('dow')``).

    Scale posture: one map-side-combined groupBy over at most
    ``n_types * 7`` cells; margins are two tiny rollups of the cell
    table broadcast back — the fact stream is scanned exactly once.

    Returns ``(event_type, dow, obs, exp_ppm, contrib_ppm)``.
    """
    cells = events.select(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).groupBy("event_type", "dow").agg(F.count("*").cast("long").alias("obs"))
    rowm = cells.groupBy("event_type").agg(F.sum("obs").alias("r"))
    colm = cells.groupBy("dow").agg(F.sum("obs").alias("c"))
    total = cells.agg(F.sum("obs").alias("n"))
    return (
        cells.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "dow")
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "dow",
            "obs",
            F.expr(
                "CAST((CAST(r AS DECIMAL(38,0)) * c * 1000000)"
                " DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("exp_ppm"),
            F.expr(
                "CAST(((CAST(obs AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
                " * (CAST(obs AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
                " * 1000000)"
                " DIV (CAST(r AS DECIMAL(38,0)) * c * n) AS BIGINT)"
            ).alias("contrib_ppm"),
        )
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column profile: per column, row/null/distinct
    counts and min/max rendered as strings — the catalog-statistics
    sweep a warehouse runs after ingest (and the CBO reads for join
    sizing).  Floating-point columns are the caller's responsibility
    to exclude: float->string rendering is engine-specific, everything
    else (strings, integers, dates) casts identically.

    Scale posture: ONE scan computes every aggregate (the multi-
    distinct runs as one Expand — n_cols passes over in-memory rows,
    not n_cols scans), and the unpivot to one row per column touches
    a single driver-sized row.

    Returns ``(column, n_rows, n_nulls, n_distinct, min_s, max_s)``.
    """
    aggs = [F.count("*").alias("_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, {c}__min, {c}__max" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column, n_nulls, n_distinct, min_s, max_s)",
        "_rows",
    ).select(
        "column",
        F.col("_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_s",
        "max_s",
    )


def winsorized_spend(
    orders: DataFrame, *, lo_pct: int = 5, hi_pct: int = 95
) -> DataFrame:
    """Robust-preprocessing readout: exact nearest-rank p5/p95 of
    order spend (cents) and the winsorized total — what a feature
    pipeline reports before clipping heavy-tailed amounts.  The
    percentile is nearest-rank (value at 1-based rank
    ``ceil(p*n/100)`` = ``(p*n + 99) DIV 100`` — pure integers, no
    interpolation, so both engines agree bit-for-bit).

    Scale posture: the global rank is ``blocked_global_rank`` (two
    bounded windows, no single-partition sort); the two threshold
    rows and the count are broadcast back over one clamp scan.

    Returns one row ``(n_orders, p_lo_cents, p_hi_cents,
    n_clipped_low, n_clipped_high, winsorized_sum_cents)``.
    """
    cents = orders.select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderkey"),
    )
    ranked = blocked_global_rank(cents, "cents", "o_orderkey")
    n = cents.agg(F.count("*").alias("_n"))
    thresholds = (
        ranked.join(F.broadcast(n))
        .where(
            (F.col("i") == F.expr(f"({int(lo_pct)} * _n + 99) DIV 100"))
            | (F.col("i") == F.expr(f"({int(hi_pct)} * _n + 99) DIV 100"))
        )
        .groupBy()
        .agg(
            F.min("cents").alias("p_lo"),
            F.max("cents").alias("p_hi"),
        )
    )
    return (
        cents.crossJoin(F.broadcast(thresholds))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("p_lo").cast("long").alias("p_lo_cents"),
            F.min("p_hi").cast("long").alias("p_hi_cents"),
            F.sum((F.col("cents") < F.col("p_lo")).cast("long"))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum((F.col("cents") > F.col("p_hi")).cast("long"))
            .cast("long")
            .alias("n_clipped_high"),
            F.sum(
                F.greatest(F.least(F.col("cents"), F.col("p_hi")), F.col("p_lo"))
            )
            .cast("long")
            .alias("winsorized_sum_cents"),
        )
    )


def quintile_mobility(
    orders: DataFrame, *, year_from: int = 1995, year_to: int = 1996, n_buckets: int = 5
) -> DataFrame:
    """Customer spend-quintile mobility matrix between two years — the
    rank-migration readout behind "do top-quintile customers stay
    top-quintile?".  Defaults 1995 -> 1996 (the driver data's first
    two full years; it holds no 1994 orders — measured).  Per year, customers WITH orders that year are
    ranked by exact spend cents (``blocked_global_rank`` — no
    single-partition sort) and cut into ``n_buckets`` equal-count
    buckets with NTILE's arithmetic (``(i-1)*k DIV n``); the matrix
    counts customers active in BOTH years per (from, to) cell.

    Scale posture: two year-filtered scans with the year predicate
    pushed down, two blocked ranks (bounded windows), one
    custkey-keyed join, a ``n_buckets^2``-cell rollup.

    Returns ``(q_from, q_to, n_customers)``.
    """
    def bucketed(year: int, out: str) -> DataFrame:
        spend = (
            orders.where(
                (F.col("o_orderdate") >= f"{year}-01-01")
                & (F.col("o_orderdate") < f"{year + 1}-01-01")
            )
            .groupBy("o_custkey")
            .agg(
                F.sum(
                    F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                ).alias("cents")
            )
        )
        ranked = blocked_global_rank(spend, "cents", "o_custkey")
        n = spend.agg(F.count("*").alias("_n"))
        return ranked.join(F.broadcast(n)).select(
            "o_custkey",
            F.expr(f"CAST((i - 1) * {int(n_buckets)} DIV _n AS INT)").alias(out),
        )

    a = bucketed(year_from, "q_from")
    b = bucketed(year_to, "q_to")
    return (
        a.join(b, "o_custkey")
        .groupBy("q_from", "q_to")
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


def seasonal_index(orders: DataFrame) -> DataFrame:
    """Month-of-year seasonal index over the whole history: each
    calendar month's share of total revenue scaled against the uniform
    1/12 share, as integer ppm (1_000_000 = exactly average) —
    the classical seasonal-decomposition readout, computed exactly
    (``month_cents * 12 * 1e6 DIV total_cents``; DECIMAL(38,0)
    headroom, non-negative so DIV == floor cross-engine).

    Scale posture: one map-side-combined 12-cell rollup + a one-row
    broadcast total.

    Returns ``(month, total_cents, idx_ppm)``.
    """
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    monthly = orders.groupBy(F.month("o_orderdate").cast("int").alias("month")).agg(
        F.sum(cents).alias("mc")
    )
    total = monthly.agg(F.sum("mc").alias("tc"))
    return monthly.crossJoin(F.broadcast(total)).select(
        "month",
        F.col("mc").cast("long").alias("total_cents"),
        F.expr(
            "CAST((CAST(mc AS DECIMAL(38,0)) * 12 * 1000000)"
            " DIV CAST(tc AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("idx_ppm"),
    )
