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
