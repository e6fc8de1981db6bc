"""Parquet table loaders for the driver testdata directories.

``spark.read.parquet`` keeps scans declarative so Catalyst pushes
filters and prunes columns into the Parquet reader (verify with
``df.explain("formatted")`` -> PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (lazy scan; no materialization)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
