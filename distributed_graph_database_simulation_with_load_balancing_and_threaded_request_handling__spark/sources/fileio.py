"""Delimited (CSV) and JSON-lines source/sink surface.

The reference's only interchange format is the dense text adjacency
matrix (``matrix_io``, primary_server.c:145-151); these are the
engine's general-purpose tabular interchange formats, built directly
on Spark's distributed csv/json datasources (one file per partition,
task-parallel read and write — nothing driver-side).

Schemas are EXPLICIT on read, always: ``inferSchema``/sampling makes
an extra pass over the data just to learn types (at 100 TB, a full
second scan) and can silently change a column's type between runs;
a declared schema is one scan, stable, and errors loudly on drift
(``mode=FAILFAST``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    """Distributed CSV sink (one part-file per partition, atomic via
    the Hadoop output committer)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)

def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    header: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """``multiline=True`` (default) parses quoted values containing
    newlines correctly — the tradeoff is that a multiline CSV file is
    not line-splittable, so ONE FILE becomes the parallelism unit.
    The writer emits one file per partition, so roundtrips keep their
    parallelism; for huge single-file CSVs of newline-free data, pass
    ``multiline=False`` to restore intra-file splitting.  (JSONL has
    no such tradeoff — JSON escapes newlines — which is why it is the
    preferred corpus interchange format.)"""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )

def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink: one JSON object per line (newlines inside
    string values are escaped by the JSON encoding, so line-oriented
    splitting stays valid — the standard LLM-corpus interchange
    shape)."""
    df.write.mode("overwrite").json(path)

def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Distributed ORC sink — the other columnar interchange format
    (Hive ecosystems standardize on ORC where the lakehouse default is
    Parquet).  Same committer-atomic one-file-per-partition shape."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Explicit-schema ORC scan: like every reader here, no inference
    pass; ORC is columnar + footer-indexed, so predicate pushdown and
    column pruning reach the reader exactly as with Parquet."""
    return spark.read.schema(schema).orc(path)
