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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner join resilient to a skewed key distribution on
    ``skewed[on]`` (e.g. a celebrity vertex's edges): each skewed row
    gets a deterministic salt in [0, salts), the other side is
    replicated once per salt, and the join runs on (key, salt) — a hot
    key's rows spread over ``salts`` reducers instead of one.

    AQE's skew-join splitting handles most cases at runtime; this is
    the static fallback for joins AQE cannot split (e.g. when the
    skewed side must stay sort-merge for a later stage) and the
    documented composition point for the BFS frontier join
    (SCALE.md).  The salt derives from xxhash64 of the whole row, so
    it is deterministic under retries.
    """
    if how != "inner":
        raise ValueError("salted_join supports inner joins only")
    from pyspark.sql import functions as F  # local alias for clarity

    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salts))
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<bigint>"))
    )
    return salted.join(replicated, on=[on, "_salt"], how="inner").drop("_salt")


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff it currently has fewer partitions.  Call on a
    *narrow projection* (id + the columns the downstream op needs) so
    the widening shuffle carries the minimum payload."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
