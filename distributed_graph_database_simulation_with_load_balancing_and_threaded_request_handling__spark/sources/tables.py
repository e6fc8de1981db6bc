"""Parquet table loaders for the driver testdata directories.

``spark.read.parquet`` keeps scans declarative so Catalyst pushes
filters and prunes columns into the Parquet reader (verify with
``df.explain("formatted")`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Parquet columns written as TIMESTAMP(NANOS) are rejected by Spark's
# vectorized reader unless read as raw nanosecond longs; table -> list
# of such columns, converted to micros timestamps after the scan
# (integer DIV keeps full precision — a double division would lose
# microseconds past 2^53 ns).
_NANOS_TS_COLS = {"events": ["ts"]}

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (lazy scan; no materialization)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name in _NANOS_TS_COLS:
        # Scoped set/restore: the conf is consulted only during schema
        # inference (verified: execution after unset succeeds), so
        # restoring it immediately never changes other readers in the
        # same session.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set(key, prev) if prev is not None else spark.conf.unset(key)
        for col in _NANOS_TS_COLS[name]:
            if isinstance(df.schema[col].dataType, LongType):
                df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
        return df
    return spark.read.parquet(path)

def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
