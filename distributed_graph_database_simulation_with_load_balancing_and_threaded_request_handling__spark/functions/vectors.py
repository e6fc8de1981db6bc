"""Dense-vector column math over ``array<float>`` embedding columns.

Built from ``zip_with``/``aggregate`` higher-order functions — JVM
execution, no UDF, no Python serialization.  All math is done in
double after an explicit cast so results are bit-comparable with the
DuckDB oracle's double arithmetic (both accumulate left-to-right).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def as_double_vec(c: Column) -> Column:
    return c.cast("array<double>")

def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )

def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))
