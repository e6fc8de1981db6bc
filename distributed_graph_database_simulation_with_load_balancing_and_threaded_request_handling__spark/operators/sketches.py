"""Cardinality sketches: a deterministic, engine-portable HyperLogLog.

Why not ``approx_count_distinct``: Spark's native HLL++ and DuckDB's
``approx_count_distinct`` use different hash functions and bias tables,
so their estimates can never be compared value-for-value.  This
operator derives the registers from md5 — available and identical in
every engine — so the EXACT same estimate is computable in ANSI SQL,
giving an approximate operator a full value oracle (same posture as
the md5 minhash/simhash variants, operators/dedup.py).

Flajolet et al. 2007 (HyperLogLog), with the standard linear-counting
small-range correction.  p=8 -> m=256 registers -> ~6.5% standard
error; the register layout is the first 2 hex chars of md5(value)
(bucket key, kept AS TEXT — no hex->int conversion needed) and the
leading-zero run of the next 15 hex chars (rho).

Scale: one map-side-combined groupBy((group), bucket) max-aggregation —
the shuffle carries at most m=256 rows per group regardless of input
size — then a per-group fold of 256 register rows.  This is the
pre-aggregable sketch shape: per-partition register maxima combine
associatively, which is what makes HLL mergeable across 1000 executors
(and across time: persisted register tables union+max to sketch a
growing corpus without rescanning it).

Extension beyond the reference (SURVEY.md §2.2 "north-star"); no
reference analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 8
_M = 1 << _P  # 256 registers
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)

# Public constants so the SQL oracle states the literal same numbers.
HLL_M = _M
HLL_ALPHA_M2 = _ALPHA * _M * _M


def _rho(rest: Column) -> Column:
    """1-based position of the leftmost 1-bit in the 60-bit value
    spelled by 15 hex chars: 4 * (leading '0' chars) + the zero-run
    inside the first nonzero hex digit + 1; 61 when all zero."""
    z = F.length(F.regexp_extract(rest, "^(0*)", 1))
    nxt = F.substr(rest, z + 1, F.lit(1))
    in_digit = (
        F.when(nxt.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
        .when(nxt.isin("4", "5", "6", "7"), 1)
        .when(nxt.isin("2", "3"), 2)
        .when(nxt == "1", 3)
    )
    return F.coalesce(z * 4 + in_digit + 1, F.lit(61)).cast("int")


def hll_registers(
    df: DataFrame, value_col: str, *, group_by: list[str] | None = None
) -> DataFrame:
    """The mergeable state: per (group, bucket) max rho.  Union two
    register tables and re-max to merge sketches."""
    group_by = group_by or []
    h = F.md5(F.col(value_col).cast("string"))
    return (
        df.select(
            *group_by,
            F.substring(h, 1, 2).alias("bucket"),
            _rho(F.substring(h, 3, 15)).alias("rho"),
        )
        .groupBy(*group_by, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, *, group_by: list[str] | None = None) -> DataFrame:
    """Estimate from a register table (``hll_registers`` output or any
    union/max-merge of such tables — max is associative, so merging
    per-partition/per-group registers then estimating equals
    estimating over the whole data).  Columns: group_by..., n_approx."""
    group_by = group_by or []
    per_group = regs.groupBy(*group_by).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_s_used"),
        F.count("*").alias("_n_used"),
    )
    # Empty registers contribute 2^0 = 1 each to the harmonic sum.
    s = F.col("_s_used") + (_M - F.col("_n_used"))
    v_empty = F.lit(_M) - F.col("_n_used")  # V = empty-register count
    raw = F.lit(_ALPHA * _M * _M) / s
    est = F.when(
        (raw <= 2.5 * _M) & (v_empty > 0),
        _M * F.log(F.lit(float(_M)) / v_empty),  # linear counting
    ).otherwise(raw)
    return per_group.select(
        *group_by, F.round(est, 4).alias("n_approx")
    )


def hll_distinct(
    df: DataFrame, value_col: str, *, group_by: list[str] | None = None
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group (rounded to 4
    places so the SQL oracle's libm differences vanish).  Columns:
    group_by..., n_approx."""
    group_by = group_by or []
    return hll_estimate(
        hll_registers(df, value_col, group_by=group_by), group_by=group_by
    )


CMS_DEPTH = 4  # independent hash rows; width is the 256 two-hex-char buckets


def cms_table(df: DataFrame, value_col: str, *, depth: int = CMS_DEPTH) -> DataFrame:
    """Count-min sketch of ``value_col`` frequencies: ``depth`` hash
    rows x 256 buckets, same engine-portability construction as the
    HLL (row-salted md5, bucket = first two hex chars — no float, no
    engine-specific hash, so the SQL oracle computes the IDENTICAL
    sketch).  Returns ``(i, bucket, cnt)``.

    Scale: the explode multiplies rows by ``depth`` BEFORE the
    aggregation, but the groupBy keys span at most depth x 256 cells,
    so map-side partial aggregation collapses each partition to <=
    1024 rows — the shuffle carries the sketch, not the data.  Sketch
    tables from disjoint data slices merge by summing cell-wise
    (integer sums: order-independent, exact).
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i")
    return (
        df.select(rows, F.col(value_col).cast("string").alias("v"))
        .select(
            "i",
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("v"))), 1, 2
            ).alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


BLOOM_K = 4  # hash probes per key
BLOOM_BITS = 65536  # bit-array size (4 hex chars: 16^4)


def _bloom_pos(i: int, v: Column) -> Column:
    """Bit position for hash row ``i``: the first 4 hex chars of a
    row-salted md5, parsed base-16 — [0, 65536), identical in any
    engine (the SQL oracle reconstructs it digit-by-digit).  65536
    bits keeps the filter useful (not saturated) up to ~10k distinct
    keys at k=4 (~4% FPR at 40k lit bits); beyond that, widen the hex
    slice — each extra hex digit is a 16x larger array at the same
    portability."""
    h = F.md5(F.concat(F.lit(f"{i}:"), v.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def bloom_bits(df: DataFrame, value_col: str) -> DataFrame:
    """Build side of an engine-portable Bloom filter: the distinct set
    of bit positions (``pos``) lit by the key set.  Same portability
    posture as the HLL/CMS above (md5 cells, no engine-specific hash).

    Scale: explode multiplies rows by k=4 before the distinct, but the
    result is bounded by the 65536-bit array regardless of input size —
    partial aggregation collapses each map task to <= 65536 rows, and
    the materialized filter always broadcasts.  Union two bit tables
    (+ distinct) to merge filters built on disjoint slices."""
    poss = F.explode(
        F.array(*[_bloom_pos(i, F.col(value_col)) for i in range(BLOOM_K)])
    ).alias("pos")
    return df.select(poss).distinct()


def bloom_probe(bits: DataFrame, items: DataFrame, item_col: str) -> DataFrame:
    """Membership probe: ``(item, maybe)`` — ``maybe`` is true iff all
    k probe positions are lit (the classic no-false-negative /
    some-false-positive contract).

    Scale: this is broadcast-Bloom join pruning — ``bits`` (<= 65536
    rows) broadcasts to every executor and the big probe side is
    filtered in place with no shuffle; only survivors proceed to an
    exact join.  The probe explode is narrow (k rows per item,
    re-collapsed by a map-side-combined groupBy on the item key)."""
    probes = items.select(F.col(item_col).alias("item")).distinct()
    probes = probes.select(
        "item",
        F.explode(
            F.array(*[_bloom_pos(i, F.col("item")) for i in range(BLOOM_K)])
        ).alias("pos"),
    )
    lit_bits = F.broadcast(bits.withColumn("hit", F.lit(1)))
    return (
        probes.join(lit_bits, "pos", "left")
        .groupBy("item")
        .agg((F.count("hit") == BLOOM_K).alias("maybe"))
    )


def cms_estimate(cms: DataFrame, items: DataFrame, item_col: str) -> DataFrame:
    """Point-frequency estimates from a ``cms_table``: for each item,
    the minimum over its ``depth`` row cells — the classic CMS upper
    bound (never under-counts; over-counts only on all-rows
    collisions).  Returns ``(item, n_est)``."""
    depth_rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("i")
    probes = items.select(F.col(item_col).alias("item")).distinct().select(
        "item",
        depth_rows,
    ).select(
        "item",
        "i",
        F.substring(
            F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("item").cast("string"))),
            1,
            2,
        ).alias("bucket"),
    )
    return (
        probes.join(cms, ["i", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").cast("long").alias("n_est"))
    )


KMV_K = 256  # sketch size: k minimum hash values per group


def kmv_sketch(
    df: DataFrame, value_col: str, *, group_by: list[str], k: int = KMV_K
) -> DataFrame:
    """KMV (k-minimum-values) theta sketch per group: the ``k``
    smallest md5 hashes of the group's DISTINCT values (Beyer et al.
    2007).  Unlike HLL registers, KMV sketches support SET-EXPRESSION
    estimates — intersections and differences — via
    ``kmv_intersect_estimate``; like every sketch here, md5 makes the
    selection byte-identical in ANSI SQL, so the approximate operator
    has a full value oracle.

    Mergeability: the union of two groups' sketches, re-trimmed to the
    k smallest, IS the sketch of the groups' union — sketches from
    disjoint corpus slices combine without rescanning.

    Scale: the distinct + per-group rank shuffle carries (group,
    16-byte hash) rows — the same exchange any exact distinct-count
    pays; output is <= k rows per group.  (A two-phase refinement —
    per-partition k-smallest before the global rank — cuts the
    exchange to k rows per partition per group; unnecessary until the
    distinct value set itself is the bottleneck.)
    """
    from pyspark.sql.window import Window

    h = df.select(
        *group_by, F.md5(F.col(value_col).cast("string")).alias("hx")
    ).distinct()
    w = Window.partitionBy(*group_by).orderBy("hx")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(*group_by, "hx", "rk")
    )


def _hx_frac(c: Column) -> Column:
    """Hash as a fraction of the hash space: first 13 hex chars (52
    bits) parsed base-16 over 2^52.  52 bits < the 53-bit double
    mantissa, so the value is EXACTLY representable — the SQL oracle's
    digit-by-digit reconstruction lands on the bit-identical double no
    matter its summation order."""
    return F.conv(F.substring(c, 1, 13), 16, 10).cast("double") / F.lit(
        float(1 << 52)
    )


def kmv_intersect_estimate(
    sketch: DataFrame,
    group_col: str,
    group_a,
    group_b,
    *,
    k: int = KMV_K,
) -> DataFrame:
    """Distinct-set union/intersection estimates for two groups from
    their KMV sketches (Beyer et al. 2007): rank the combined distinct
    hash set, take theta = the k-th smallest as a fraction of hash
    space; est_union = (k-1)/theta, and est_inter scales est_union by
    the fraction of the k combined minima present in BOTH sketches.
    When the combined set has fewer than k hashes the sketches are
    exhaustive and the exact counts are returned (theta = 1 regime).

    Returns one row: ``(est_union, est_inter)``, rounded to 4 places.
    Driver-side data never exceeds 2k rows of 16-byte hashes.
    """
    from pyspark.sql.window import Window

    a = sketch.where(F.col(group_col) == group_a).select("hx")
    b = sketch.where(F.col(group_col) == group_b).select("hx")
    u = a.unionAll(b).distinct()
    ranked = u.withColumn("rk", F.row_number().over(Window.orderBy("hx")))
    kth = ranked.where(F.col("rk") == k).select(
        _hx_frac(F.col("hx")).alias("theta")
    )
    n_union = u.agg(F.count("*").cast("long").alias("n_u"))
    common = (
        a.join(b, on="hx")
        .join(F.broadcast(kth.select(F.col("theta").alias("_t"))), how="left")
        .agg(
            F.count("*").cast("long").alias("n_common_all"),
            # coalesce: SUM over the empty a⋈b aggregation is NULL, and a
            # NULL n_common would poison est_inter in the theta regime for
            # disjoint sets — the oracle COALESCEs the same sum to 0.
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_t").isNull() | (_hx_frac(F.col("hx")) < F.col("_t")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_common"),
        )
    )
    return (
        n_union.crossJoin(common)
        .join(F.broadcast(kth), how="left")
        .select(
            F.round(
                F.when(F.col("theta").isNotNull(), (k - 1) / F.col("theta"))
                .otherwise(F.col("n_u").cast("double")),
                4,
            ).alias("est_union"),
            F.round(
                F.when(
                    F.col("theta").isNotNull(),
                    F.col("n_common") / F.lit(float(k)) * ((k - 1) / F.col("theta")),
                ).otherwise(F.col("n_common_all").cast("double")),
                4,
            ).alias("est_inter"),
        )
    )


def hdr_bucket(c: Column, *, sub_bits: int = 4) -> Column:
    """The HDR bucket of a non-negative integer: ``c`` with all but
    its top ``sub_bits+1`` significant bits zeroed (relative bucket
    width <= 2^-sub_bits).  Pure integer arithmetic — bit length via
    ``length(bin(c))``, never float log2 — so the identical expression
    runs in ANSI SQL and the bucket id doubles as the bucket's exact
    lower bound."""
    k = int(sub_bits)
    e = (F.length(F.bin(c)) - 1).cast("int")
    shift = F.greatest(e - k, F.lit(0))
    pw = F.pow(F.lit(2.0), shift.cast("double")).cast("long")
    return (c / pw).cast("long") * pw


def hdr_estimates(
    hist: DataFrame,
    *,
    group_by: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile selection over an HDR histogram ``(*group_by, bucket,
    cnt)``: per stratum, the smallest bucket whose cumulative count
    reaches each requested quantile — ``(*group_by, est_0..est_n)``.
    Runs over BIN-cardinality rows (bounded by construction), so the
    per-stratum window never carries data-sized partitions."""
    from pyspark.sql.window import Window

    gcols = list(group_by)
    wp = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    cum = hist.select(
        *gcols,
        "bucket",
        F.sum("cnt").over(wp.orderBy("bucket")).alias("cum"),
        F.sum("cnt").over(wp).alias("n"),
    )
    return cum.groupBy(*gcols).agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.lit(float(q)) * F.col("n"), F.col("bucket"))
            ).alias(f"est_{i}")
            for i, q in enumerate(qs)
        ]
    )


def hdr_quantile_err(
    df: DataFrame,
    value: Column,
    *,
    group_by: list[str] | None = None,
    sub_bits: int = 4,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable HDR-histogram quantile estimation WITH its measured
    error against the in-engine exact percentile — one row per
    stratum and quantile: ``(*group_by, q, est_v, exact_v, rel_err)``.

    This is the committed 100 TB replacement for the exact-percentile
    gather (see ``sample_quantile_err``'s scale seam): values collapse
    to HDR buckets — the value with all but its top ``sub_bits+1``
    significant bits zeroed, i.e. ≤ 2^-sub_bits relative bucket width
    — so the whole sketch is a bounded (O(sub_bits·log range) bins)
    map-side-combined COUNT histogram, mergeable across partitions,
    days, or tables by integer addition.  Unlike t-digest /
    approx_percentile the bucket function is a PURE INTEGER expression
    (bit length via ``length(bin(c))`` — no float log2), so the same
    sketch reproduces bit-identically in ANSI SQL and the estimate is
    value-exact under the oracle, while the ERROR against the exact
    interpolated percentile is measured, not assumed.

    Scale: one scan builds the histogram (map-side combine onto the
    tiny bin key set); the cumulative walk and quantile selection run
    per stratum over BIN-cardinality rows (a few hundred), never over
    data rows — the per-stratum gather that makes exact percentiles
    single-task at scale is gone.
    """
    gcols = list(group_by or [])
    # Exact cents via the decimal cast (HALF_UP in both engines), so
    # the bucket function sees integers, never raw doubles.
    c = (value.cast("decimal(18,2)") * 100).cast("long")
    base = df.select(*gcols, c.alias("c"), value.cast("double").alias("x"))
    hist = (
        base.select(*gcols, hdr_bucket(F.col("c"), sub_bits=sub_bits).alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    est = hdr_estimates(hist, group_by=gcols, qs=qs)
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    grouped = base.groupBy(*gcols) if gcols else base
    exact = grouped.agg(F.percentile(F.col("x"), qarr).alias("exact_q"))
    joined = est.join(exact, gcols) if gcols else est.crossJoin(exact)
    exploded = joined.select(
        *gcols,
        F.posexplode(
            F.array(*[F.col(f"est_{i}") for i in range(len(qs))])
        ).alias("i", "est_c"),
        "exact_q",
    ).select(
        *gcols,
        F.element_at(F.lit(list(map(float, qs))), F.col("i") + 1).alias("q"),
        F.round(F.col("est_c") / 100.0, 4).alias("est_v"),
        F.round(
            F.element_at(F.col("exact_q"), F.col("i") + 1), 4
        ).alias("exact_v"),
    )
    return exploded.select(
        *gcols,
        "q",
        "est_v",
        "exact_v",
        # An all-zero stratum has exact_v = 0 AND est_v = 0 — report
        # rel_err 0 there instead of raising under ANSI mode.  Guard on
        # BOTH columns (round-8 ADVICE): with negative-value strata the
        # est <= exact invariant does not hold, and a nonzero estimate
        # against an exact 0 is a REAL estimator error that must
        # surface (try_divide -> NULL), never be silently reported 0.
        F.round(
            F.when((F.col("exact_v") == 0.0) & (F.col("est_v") == 0.0), 0.0).otherwise(
                F.try_divide(F.col("exact_v") - F.col("est_v"), F.col("exact_v"))
            ),
            4,
        ).alias("rel_err"),
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    num: int = 12,
    den: int = 10,
    depth: int = CMS_DEPTH,
    hex_chars: int = 3,
) -> DataFrame:
    """Heavy hitters — items whose frequency is at least ``num/den``
    times the MEAN item frequency — via broadcast-CMS map-side pruning
    + exact second-pass verify (the sketch-then-verify pattern that
    makes the sketch USEFUL, not just measurable):

    1. build a ``depth`` x 16^``hex_chars`` count-min sketch (same
       row-salted md5 cells as ``cms_table``; 3 hex chars = 4096
       buckets per row so the sketch still broadcasts everywhere);
    2. stamp every row's estimate with ``depth`` BROADCAST lookups
       (no explode, no shuffle) and drop rows whose item's CMS upper
       bound is below the threshold MAP-SIDE — since CMS never
       under-counts, no true heavy hitter is lost;
    3. exact-count only the survivors and keep items passing the
       threshold on the exact count.

    The threshold is the cross-multiplied integer predicate
    ``n * n_items * den >= total * num`` (no division anywhere), with
    (total, n_items) from a one-row broadcast.  Returns ``(item,
    n_exact, n_est)``.

    Scale: the win is step 2 — the exact-count shuffle carries only
    near-heavy rows.  Pruning power degrades as distinct cardinality
    outgrows the sketch (cell collisions inflate upper bounds toward
    "everyone passes"); correctness never does.  Widen ``hex_chars``
    with cardinality — each extra char is 16x more cells at the same
    engine portability.
    """
    v = df.select(F.col(value_col).cast("string").alias("item"))
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i")
    cells = (
        v.select(rows, "item")
        .select(
            "i",
            F.substring(
                F.md5(
                    F.concat(F.col("i").cast("string"), F.lit(":"), F.col("item"))
                ),
                1,
                hex_chars,
            ).alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    totals = v.agg(
        F.count("*").alias("_tot"), F.count_distinct("item").alias("_ni")
    )
    est = v
    for i in range(depth):
        ci = cells.where(F.col("i") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        est = est.withColumn(
            f"_b{i}",
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("item"))), 1, hex_chars
            ),
        ).join(F.broadcast(ci), f"_b{i}")
    est_col = F.least(*[F.col(f"_c{i}") for i in range(depth)])
    pruned = (
        est.withColumn("_est", est_col)
        .join(F.broadcast(totals))
        .where(
            F.col("_est") * F.col("_ni") * F.lit(int(den))
            >= F.col("_tot") * F.lit(int(num))
        )
    )
    return (
        pruned.groupBy("item")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.min("_est").cast("long").alias("n_est"),
            F.min("_tot").alias("_tot"),
            F.min("_ni").alias("_ni"),
        )
        .where(
            F.col("n_exact") * F.col("_ni") * F.lit(int(den))
            >= F.col("_tot") * F.lit(int(num))
        )
        .select("item", "n_exact", "n_est")
    )
