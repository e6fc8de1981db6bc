"""Tests for the partitioning posture helpers."""

from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.partitioning import (
    ensure_parallelism,
    salted_join,
)


def test_ensure_parallelism_widens_single_partition(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    out = ensure_parallelism(df, min_partitions=4)
    assert out.rdd.getNumPartitions() >= 4
    assert out.count() == 100


def test_ensure_parallelism_noop_when_wide(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "x long").repartition(8)
    assert ensure_parallelism(df, min_partitions=4) is df


def test_salted_join_matches_plain_join(spark):
    # Heavy skew: 500 rows share key 1.
    skewed = spark.createDataFrame(
        [(1 if i < 500 else i, i) for i in range(600)], "k long, payload long"
    )
    dim = spark.createDataFrame([(i, f"v{i}") for i in range(600)], "k long, label string")
    plain = {(r["k"], r["payload"], r["label"])
             for r in skewed.join(dim, on="k").collect()}
    salted = {(r["k"], r["payload"], r["label"])
              for r in salted_join(skewed, dim, "k", salts=4).collect()}
    assert salted == plain
    assert len(salted) == 600


def test_ivf_partitioned_layout_prunes_and_matches(spark, tmp_path):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
        ivf_topk_partitioned,
        save_ivf_partitioned,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = ivf_centroids(emb, n_cells=16)
    path = str(tmp_path / "ivf")
    save_ivf_partitioned(emb, path, cents)

    part = ivf_topk_partitioned(spark, path, q, cents, k=10, n_probe=4)
    flat = ivf_topk(emb, q, k=10, n_cells=16, n_probe=4)
    assert [tuple(r) for r in part.collect()] == [tuple(r) for r in flat.collect()]

    # The probe predicate must reach the file listing as a partition
    # filter (metadata pruning), not a post-scan filter.
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_train_split_prunes_scan_columns(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sampling import (
        train_split,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = train_split(docs).select("doc_id", "lang", "split")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Zero shuffles (pure projection) and a pruned parquet scan: the
    # text/source/n_chars columns never leave the reader.
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema


def test_asof_join_is_single_shuffle(spark):
    import datetime

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        asof_join,
    )

    ts = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, ts)], "k int, t timestamp")
    right = spark.createDataFrame([(1, ts, 1.0)], "k int, rt timestamp, v double")
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="rt", values=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Union-merge shape: ONE hash exchange on the join key feeding the
    # window sort — no range join, no broadcast-nested-loop.
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_ship_priority_plan_pushdown_broadcast_topk(spark):
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        ship_priority,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    out = ship_priority(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
        segment="BUILDING",
        date="1998-06-01",
        k=10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Date/segment predicates reach the parquet readers, the filtered
    # customer keyset broadcasts, and top-k plans as
    # TakeOrderedAndProject (per-partition heap), not a global sort.
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan and "GreaterThan(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # lineitem scan is pruned to the join/aggregate columns
    assert "l_comment" not in plan and "l_quantity" not in plan
