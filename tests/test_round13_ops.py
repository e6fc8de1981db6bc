"""Round-13 optimization-internals tests: the tracked-persist release
registry (round-12 verdict #7) and the de-gamed harness hooks."""

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    return (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def test_tracked_persists_release_on_demand(spark):
    """Operators registering multi-consumer persists must (a) still
    return correct lazy results, and (b) leave NO persisted blocks
    after release_operator_persists() — the explicit reclamation the
    bench reset relies on."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators import (
        persists,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dedup import (
        simhash_dedup,
    )

    persists.release_operator_persists()  # clean slate
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "a completely different sentence here")],
        "doc_id long, text string",
    )
    out = simhash_dedup(docs).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    assert persists._LIVE, "simhash_dedup should register its banded persist"
    handle = persists._LIVE[-1]
    assert handle.storageLevel.useMemory or handle.storageLevel.useDisk
    n = persists.release_operator_persists()
    assert n >= 1
    assert not persists._LIVE
    assert not handle.storageLevel.useMemory
    assert not handle.storageLevel.useDisk


def test_reset_session_caches_releases_tracked_persists(spark):
    """The bench's per-run reset must sweep the operator persists too."""
    import __spark_entry__ as entry
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators import (
        persists,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dedup import (
        simhash_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    simhash_dedup(docs).collect()
    assert persists._LIVE
    entry.reset_session_caches()
    assert not persists._LIVE
