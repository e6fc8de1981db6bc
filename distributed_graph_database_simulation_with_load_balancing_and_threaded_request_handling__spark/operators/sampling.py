"""Deterministic sampling and dataset splitting for training-data
pipelines: hash-based train/val/test assignment and per-stratum
(e.g. per-language) Bernoulli sampling with exact, reproducible
semantics.

Why md5 and not xxhash64: the split decision is ``first 8 hex chars of
md5(salt || id)`` compared lexicographically against a fixed-width hex
threshold.  Fixed-width lowercase hex compares lexicographically
exactly as it compares numerically, so the SAME predicate runs in any
ANSI SQL engine (the DuckDB oracle uses the literal same strings) and
the assignment is stable across engines, runs, partitionings, and
cluster sizes — the property a reproducible training corpus needs.
xxhash64 is faster but Spark-only.  (Same trade documented for the
minhash md5 variant, dedup.py.)

Scale: both operators are a single narrow projection + filter over the
input — no shuffle, no sampling pass, no driver state.  The stratum
rate table is a broadcast join (dozens of rows).  Every decision is a
pure function of (salt, id), so adding data never reshuffles prior
assignments (stable incremental corpus refreshes).

Extension beyond the reference (SURVEY.md §2.2 "north-star"
operators); no reference analogue — its workload has no sampling.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_WIDTH = 8
_SPACE = 1 << (4 * _HEX_WIDTH)  # 2^32 buckets


def _hex_threshold(p: float) -> str:
    """Fixed-width hex threshold t such that P[slice < t] = floor(p*2^32)/2^32."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {p}")
    if p >= 1.0:
        return "g" * _HEX_WIDTH  # sorts above every hex string: keep all
    return format(math.floor(p * _SPACE), f"0{_HEX_WIDTH}x")


def rate_threshold(p: float) -> str:
    """The hex threshold for rate ``p`` — public so oracle SQL can
    state the literal same constant the Spark predicate uses."""
    return _hex_threshold(p)


def hash_slice(id_col: Column, *, salt: str = "") -> Column:
    """The uniform decision variable: first 8 hex chars of
    md5(salt || id), lexicographically ~ U{0..2^32-1}."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _HEX_WIDTH
    )


def train_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fracs: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashed id.

    ``fracs`` maps split name -> fraction (must sum to 1.0); default
    90/5/5 train/val/test.  Assignment is the CASE over cumulative
    hex thresholds — one codegen'd projection, zero shuffles, stable
    under data growth.
    """
    fracs = fracs or {"train": 0.90, "val": 0.05, "test": 0.05}
    if abs(sum(fracs.values()) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0: {fracs}")
    names = list(fracs)
    cum = 0.0
    slice_col = hash_slice(F.col(id_col), salt=salt)
    expr: Column = F.lit(names[-1])  # remainder bucket
    # Build CASE from the last boundary backwards so earlier splits win.
    boundaries = []
    for name in names[:-1]:
        cum += fracs[name]
        boundaries.append((name, _hex_threshold(cum)))
    for name, thr in reversed(boundaries):
        expr = F.when(slice_col < thr, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_thresholds(fracs: dict[str, float] | None = None) -> list[tuple[str, str]]:
    """(split name, cumulative hex threshold) pairs — exported so the
    SQL oracle states the literal same constants."""
    fracs = fracs or {"train": 0.90, "val": 0.05, "test": 0.05}
    out, cum = [], 0.0
    for name in list(fracs)[:-1]:
        cum += fracs[name]
        out.append((name, _hex_threshold(cum)))
    return out


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row iff
    hash_slice(id) < threshold(rate[stratum]) — the domain-mixing
    primitive (upsample scarce languages, downsample dominant ones).

    The rate table joins broadcast (strata cardinality is small);
    strata absent from ``rates`` get ``default_rate``.
    """
    spark = df.sparkSession
    rate_rows = [(k, _hex_threshold(v)) for k, v in rates.items()]
    rate_df = spark.createDataFrame(rate_rows, f"{strata_col} string, _thr string")
    joined = df.join(F.broadcast(rate_df), on=strata_col, how="left")
    thr = F.coalesce(F.col("_thr"), F.lit(_hex_threshold(default_rate)))
    return (
        joined.where(hash_slice(F.col(id_col), salt=salt) < thr).drop("_thr")
    )


def sample_quantile_err(
    df: DataFrame,
    value: Column,
    sample_key: Column,
    *,
    group_by: list[str] | None = None,
    rate: float = 0.1,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    salt: str = "q",
) -> DataFrame:
    """Accuracy contract for sampling-based quantile estimation: exact
    interpolated quantiles of ``value`` over the FULL data vs over a
    deterministic md5-thresholded sample, with the absolute error —
    one row per stratum and requested quantile
    ``(*group_by, q, exact_v, sample_v, abs_err)``.

    The same posture as the LSH/minhash recall queries: an
    approximation (here, estimate-from-a-sample) shipped WITH a
    measured error against the in-engine exact ground truth, in one
    declared query.  The sample membership is the md5-hex-threshold
    decision (``hash_slice``), so the "sample" is a deterministic,
    engine-reproducible set — the error numbers are value-exact in the
    SQL oracle, not a statistical claim.

    Scale: ONE scan — the sample quantile is computed with a
    conditional value (non-sampled rows contribute NULL, which
    ``percentile`` ignores), so no second pass and no materialized
    sample.  Exact percentile gathers each STRATUM's values to one
    task, so with ``group_by`` the work parallelizes across strata and
    no single-global-group aggregate appears in the plan (pass
    ``group_by=None`` only for bounded inputs); for per-stratum data
    still too large to gather, swap in ``approx_percentile`` (t-digest,
    mergeable map-side) and keep this exact form as its acceptance
    test at fixture scale.
    """
    thr = rate_threshold(rate)
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    gcols = list(group_by or [])
    flagged = df.select(
        *gcols,
        value.cast("double").alias("x"),
        (hash_slice(sample_key, salt=salt) < thr).alias("s"),
    )
    grouped = flagged.groupBy(*gcols) if gcols else flagged
    agg = grouped.agg(
        F.percentile(F.col("x"), qarr).alias("full_q"),
        F.percentile(F.when(F.col("s"), F.col("x")), qarr).alias("samp_q"),
    )
    # A stratum where NO row cleared the sample threshold yields a NULL
    # samp_q (percentile over all-NULL input), and arrays_zip(x, NULL)
    # is NULL — posexplode would then DROP the whole stratum instead of
    # reporting "no sample estimate".  Coalesce to an array of NULL
    # doubles so such strata surface as (exact_v, NULL, NULL) rows,
    # matching the SQL oracle's quantile_cont(...) FILTER semantics.
    null_arr = F.array(*[F.lit(None).cast("double") for _ in qs])
    exploded = agg.select(
        *gcols,
        F.posexplode(
            F.arrays_zip("full_q", F.coalesce("samp_q", null_arr).alias("samp_q"))
        ).alias("i", "z"),
    ).select(
        *gcols,
        F.element_at(F.lit(list(map(float, qs))), F.col("i") + 1).alias("q"),
        F.round(F.col("z.full_q"), 4).alias("exact_v"),
        F.round(F.col("z.samp_q"), 4).alias("sample_v"),
    )
    return exploded.select(
        *gcols,
        "q",
        "exact_v",
        "sample_v",
        F.round(F.abs(F.col("exact_v") - F.col("sample_v")), 4).alias("abs_err"),
    )


def temperature_sample(
    df: DataFrame,
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    tau: float = 2.0,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based corpus resampling: keep stratum ``l`` at rate
    ``(min_count / count_l) ** (1/tau)`` — the standard multilingual
    data-mix primitive (tau=1 flattens every language to the smallest
    one's size; tau→inf keeps the natural distribution; intermediate
    tau upsamples scarce strata toward uniform).  Unlike
    ``stratified_sample`` the rates are DERIVED FROM THE DATA inside
    the plan, so the same call re-balances any corpus snapshot without
    a precomputed rate table.

    Cross-engine exactness: membership is the usual md5-hex-threshold
    decision, and for the default ``tau=2.0`` the rate is
    ``sqrt(min/count)`` — IEEE-754 division and sqrt are correctly
    rounded, so ``floor(rate * 2^32)`` is bit-identical in any IEEE
    engine and the kept set is integer-exact in the DuckDB oracle.
    Other tau values go through ``pow``, which is NOT correctly
    rounded; they are statistically fine but carry a documented 1-ulp
    cross-engine membership risk at threshold boundaries.

    Scale: one count aggregation over the stratum column (map-side
    combined, output rows = stratum cardinality), a broadcast scalar
    min, a broadcast rate-table join back onto the fact table, and a
    narrow filter — the data itself is never shuffled.  Rates are pure
    functions of the observed counts, so a corpus refresh recomputes
    them in the same pass.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    mn = counts.agg(F.min("_n").alias("_mn"))
    if tau == 2.0:
        rate = F.sqrt(F.col("_mn").cast("double") / F.col("_n").cast("double"))
    else:
        rate = F.pow(
            F.col("_mn").cast("double") / F.col("_n").cast("double"), 1.0 / tau
        )
    # floor(rate*2^32) can round UP to exactly 2^32 when rate is within
    # 2^-33 of 1.0; hex('100000000') is 9 chars and would sort BELOW
    # 'f...' slices, silently dropping rows — clamp both engines to the
    # keep-all sentinel ('g' sorts above every hex digit).
    v = F.floor(rate * F.lit(float(_SPACE)))
    thr = F.when(v >= F.lit(_SPACE), F.lit("g" * _HEX_WIDTH)).otherwise(
        F.lpad(F.lower(F.hex(v)), _HEX_WIDTH, "0")
    )
    rate_df = counts.crossJoin(F.broadcast(mn)).select(
        strata_col, thr.alias("_thr")
    )
    return (
        df.join(F.broadcast(rate_df), on=strata_col, how="inner")
        .where(hash_slice(F.col(id_col), salt=salt) < F.col("_thr"))
        .drop("_thr")
    )


def group_sample_exact(
    df: DataFrame,
    *,
    group_by: list[str],
    id_col: str,
    k: int,
    salt: str = "gsample",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank each group's rows
    by the salted md5 of the id and keep the k smallest — the
    "balanced eval subset" selection a training pipeline runs per
    language/domain.  Unlike rate-based Bernoulli sampling
    (``stratified_sample``), the output size per group is EXACT
    (min(k, group size)), and unlike ``ORDER BY rand()`` it is
    deterministic across runs, engines, and partitionings.

    Returns the input rows plus ``sample_rank`` (1-based within
    group).  Scale: one hash projection + one per-group window rank —
    a single shuffle keyed on the group; no global sort.  A skewed
    group is window skew: pre-filter with an approximate hash
    threshold (rate ~ k/|group|) to shrink the ranked set when groups
    are huge.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_by).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def grouped_split_summary(
    df: DataFrame,
    *,
    group_col: str = "source",
    fracs: dict[str, float] | None = None,
    salt: str = "gsplit",
    weight_col: str | None = None,
) -> DataFrame:
    """Leakage-safe dataset split: the md5 decision variable hashes
    the GROUP key, not the row id, so every row of a group lands in
    the same split — the contamination guard for web corpora, where
    near-duplicates cluster by origin and a row-hashed split leaks
    them across train/test.  (Composes ``train_split`` with
    ``id_col=group_col``; the no-straddle property is then true BY
    CONSTRUCTION — the split is a pure function of the group key.)

    Returns the per-split audit row a pipeline logs: ``(split,
    n_groups, n_rows[, total_weight])``.

    Scale posture: the assignment is a codegen'd projection (zero
    shuffles); the audit is one groupBy(split) with a distinct-count
    — at 100 TB swap count_distinct for approx_count_distinct or a
    two-level (split, group) pre-aggregation; output is |splits| rows
    either way.
    """
    assigned = train_split(df, id_col=group_col, fracs=fracs, salt=salt)
    aggs = [
        F.countDistinct(group_col).cast("long").alias("n_groups"),
        F.count("*").cast("long").alias("n_rows"),
    ]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("long").alias("total_weight"))
    return assigned.groupBy("split").agg(*aggs)


def leakage_matrix(
    pairs: DataFrame,
    assigned: DataFrame,
    *,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Split-leakage audit: classify near-duplicate ``pairs``
    ``(id_a, id_b)`` by the splits their members landed in.  Off-
    diagonal rows (train x test, train x val, ...) are LEAKED
    near-duplicates — memorized training text that inflates eval
    scores; the diagonal is harmless.  Grouped splits
    (``grouped_split_summary``) exist precisely to drive the
    off-diagonal to zero when dups cluster by group.

    Scale posture: two broadcast-or-shuffle joins keyed on the id (the
    pair table is LSH-verified output, orders of magnitude smaller
    than the corpus), then a map-side-combined groupBy over at most
    ``n_splits^2`` canonical cells.

    Returns ``(split_a, split_b, n_pairs)`` with split_a <= split_b.
    """
    sp = assigned.select(F.col(id_col).alias("_id"), F.col(split_col).alias("_sp"))
    joined = (
        pairs.select("id_a", "id_b")
        .join(sp.select(F.col("_id").alias("id_a"), F.col("_sp").alias("sa")), on="id_a")
        .join(sp.select(F.col("_id").alias("id_b"), F.col("_sp").alias("sb")), on="id_b")
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def negative_sample(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "lang",
    k: int = 3,
    salt: str = "ns",
) -> DataFrame:
    """Hash-blocked NEGATIVE SAMPLING (round 9) — the contrastive-
    training primitive: for every anchor row, pick ``k`` deterministic
    negatives from a different ``group_col`` (excluding same-group
    rows avoids false negatives, the SimCLR/DPR recipe).

    Scale shape: the naive form is an all-pairs ranking (N^2).  Here
    every candidate is hashed into one of 16 slices (first md5 hex
    char; widen the prefix to grow the bucket count with N) and each
    anchor probes EXACTLY ONE hash-chosen slice — an N x N/B join
    instead of N x N, with uniformity by construction (md5 buckets).
    The per-anchor ranking is a window over ~N/B rows keyed on the
    anchor, never a global sort.  All
    decisions are salted md5 (the engine-portable split idiom above),
    so membership and ranking replay exactly in the SQL oracle.

    Returns ``(anchor_id, neg_id, rnk)`` with rnk in 1..k.
    """
    a = df.select(
        F.col(id_col).cast("long").alias("anchor_id"),
        F.col(group_col).alias("a_grp"),
        F.substring(
            F.md5(F.concat(F.lit(salt + "b"), F.col(id_col).cast("string"))), 1, 1
        ).alias("bkt"),
    )
    c = df.select(
        F.col(id_col).cast("long").alias("neg_id"),
        F.col(group_col).alias("c_grp"),
        F.substring(
            F.md5(F.concat(F.lit(salt + "c"), F.col(id_col).cast("string"))), 1, 1
        ).alias("bkt"),
    )
    pair_h = F.md5(
        F.concat(
            F.lit(salt + "p"),
            F.col("anchor_id").cast("string"),
            F.lit("|"),
            F.col("neg_id").cast("string"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(pair_h.asc(), F.col("neg_id").asc())
    return (
        a.join(c, "bkt")
        .where(F.col("a_grp") != F.col("c_grp"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("anchor_id", "neg_id", F.col("rnk").cast("int").alias("rnk"))
    )
