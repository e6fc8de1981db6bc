import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("engine-tests")
        .master("local[4]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()

def make_edges(spark, pairs, graph_id=1):
    """Symmetric edge-list DataFrame from undirected 1-indexed pairs."""
    rows = []
    for u, v in pairs:
        rows.append((graph_id, u, v))
        rows.append((graph_id, v, u))
    return spark.createDataFrame(rows, "graph_id int, src long, dst long")

# Canonical fixtures from FIXTURES.md §2 (undirected, 1-indexed).
REF_G1 = [(1, 2), (2, 3), (3, 4), (4, 5)]            # path
REF_G2 = [(1, 2)]                                    # pre-modify
REF_G2_POST = [(1, 2), (2, 3)]                       # post-modify path
REF_G3 = [(1, 2), (2, 3), (2, 4), (2, 5)]            # star, center 2
SIO_G1 = [(1, 2), (2, 3), (2, 4), (4, 5)]
SIO_G2 = [(1, 2), (1, 4), (2, 5), (2, 7), (3, 4), (6, 7)]
