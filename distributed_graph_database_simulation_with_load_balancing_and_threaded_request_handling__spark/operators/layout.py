"""Write-layout planning operators: Z-order clustering keys and
small-file compaction bin assignment — the table-maintenance side of a
lakehouse ingest pipeline (Delta/Iceberg OPTIMIZE ZORDER / compaction,
re-expressed as engine-portable declared queries).

No reference analogue (the reference's store is a fixed text matrix
per graph, SURVEY.md §1.2); these extend the §2.2 sinks/sources
category with the layout DECISIONS a 100 TB table needs: multi-
dimensional clustering so 2-D range predicates prune files, and
target-size bin packing so the small-file problem stays bounded.

Engine portability: the Z-value bit interleave is written as pure
integer DIV/MOD/multiply arithmetic (no engine-specific bit
intrinsics), and compaction bins come from an integer running sum —
both reproduce exactly in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Z_BITS = 8  # 8 bits per dimension -> 16-bit z-values, 65536 cells


def z_value(x: Column, y: Column, *, bits: int = Z_BITS) -> Column:
    """Morton (Z-order) interleave of two non-negative ints: bit i of
    ``x`` lands at position 2i, bit i of ``y`` at 2i+1.  Written as
    SUM((x DIV 2^i) % 2 * 4^i) + 2*SUM((y DIV 2^i) % 2 * 4^i) so the
    same arithmetic runs in any SQL engine; Catalyst constant-folds
    the powers and the whole expression stays in codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        p2, p4 = 1 << i, 1 << (2 * i)
        z = (
            z
            + ((x.cast("long") / F.lit(p2)).cast("long") % 2) * F.lit(p4)
            + ((y.cast("long") / F.lit(p2)).cast("long") % 2) * F.lit(p4) * 2
        )
    return z


def zorder_layout(
    orders: DataFrame,
    *,
    epoch: str = "1992-01-01",
    cells_per_file: int = 4096,
) -> DataFrame:
    """Z-order clustering readout over orders on the 2-D key
    (custkey mod 256, order-day mod 256): per target "file" (a run of
    ``cells_per_file`` consecutive z-cells), the row count and the
    min/max of BOTH dimensions — ``(file_id, n_rows, min_cust,
    max_cust, min_day, max_day)``.

    The min/max spans ARE the pruning story: because consecutive
    z-cells are near in both dimensions, each file's span covers only
    ~1/sqrt(files) of each dimension's domain, so a predicate on
    EITHER dimension skips most files (the reason OPTIMIZE ZORDER
    exists).  A linear layout gets narrow spans in one dimension and
    full-domain spans in the other.

    Scale notes: the z-value is per-row codegen arithmetic on the
    scan; the rollup is one map-side-combined groupBy on file_id
    (65536/cells_per_file groups).  An actual write would range-
    partition on the z-value and write per-partition files — the
    file_id here is exactly that range partitioner, made inspectable.
    """
    x = (F.col("o_custkey") % 256).cast("long")
    day = F.datediff(F.col("o_orderdate"), F.lit(epoch).cast("timestamp"))
    y = (day % 256).cast("long")
    z = z_value(x, y)
    return (
        orders.select(
            x.alias("cx"), y.alias("cy"), (z / F.lit(cells_per_file)).cast("long").alias("file_id")
        )
        .groupBy("file_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("cx").alias("min_cust"),
            F.max("cx").alias("max_cust"),
            F.min("cy").alias("min_day"),
            F.max("cy").alias("max_day"),
        )
    )


def compaction_plan(
    documents: DataFrame,
    *,
    target_bytes: int = 16384,
    group_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Small-file compaction plan: within each source partition,
    assign files (documents standing in, with ``n_chars`` as the
    size) to target-size output bins by cumulative offset — bin =
    (running_sum - size) DIV target, the streaming first-fit that
    never splits a file and starts a new bin once the current one has
    reached the target.  Returns per-bin ``(source, bin_id, n_files,
    total_bytes)``.

    Scale notes: ONE window (partitioned by the source directory,
    ordered by file id — compaction is per-partition-directory by
    definition, so no global window exists) computes the running sum;
    the rollup is map-side combined on (source, bin).  This is the
    planning half of OPTIMIZE: the execute half is a
    repartition-by-bin + per-bin concat write.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sz = F.col(size_col).cast("long")
    run = F.sum(sz).over(w)
    binned = documents.select(
        F.col(group_col).alias("source"),
        ((run - sz) / F.lit(int(target_bytes))).cast("long").alias("bin_id"),
        sz.alias("sz"),
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("sz").cast("long").alias("total_bytes"),
    )
