"""Partitioning posture helpers.

At target scale (100 TB, thousands of input files) the scan already
yields ample partitions and these helpers are no-ops.  On small or
single-file inputs (local test data, a coalesced upstream write) the
scan can come back as a handful of partitions, serializing all
CPU-heavy per-row work (shingling, hashing, vector math) onto one
core.  ``ensure_parallelism`` widens only in that degenerate case, so
the extra shuffle never happens where it would actually cost
something.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff it currently has fewer partitions.  Call on a
    *narrow projection* (id + the columns the downstream op needs) so
    the widening shuffle carries the minimum payload."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
