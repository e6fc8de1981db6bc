"""Hash-sketch column expressions shared by the dedup operators.

Only expressions that are cheap *per evaluation* belong here: Spark's
higher-order array functions are CodegenFallback (interpreted), and an
expression referenced inside a lambda body is re-evaluated once per
array element.  Nesting something expensive (a regexp, another
transform) inside a lambda therefore multiplies its cost by the array
length — the MinHash/SimHash signature computations live in
``operators.dedup`` as explode -> xxhash64 -> wide partial aggregation
instead, which is whole-stage-codegen'd and map-side combined (the
shape that holds at 100 TB: the shuffle carries (id, k longs), never
shingles or text).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def band_hashes(signature: Column, bands: int, rows: int) -> Column:
    """array<bigint> of one bucket hash per LSH band: band j hashes
    signature[j*rows : (j+1)*rows].  ``xxhash64`` over the sliced array
    plus the band index keeps buckets of different bands disjoint.
    ``signature`` must be a plain attribute (see module docstring).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.xxhash64(F.slice(signature, j * rows + 1, rows), j),
    )


def pack_sign_bits(bit_cols: list[Column]) -> Column:
    """Pack sign columns (1/0 longs, index i = value bit i) into one
    signed 64-bit long with shifts (shifts are exempt from ANSI
    overflow checks, which Spark 4 enables by default — a Horner
    multiply would trip them at the sign bit)."""
    out = F.lit(0).cast("long")
    for i, b in enumerate(bit_cols):
        out = out.bitwiseOR(F.shiftleft(b, i))
    return out
