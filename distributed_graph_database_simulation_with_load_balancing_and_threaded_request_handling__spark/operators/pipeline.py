"""End-to-end training-corpus preparation: the composition a real
LLM-data pipeline runs — exact dedup -> quality gate -> deterministic
split -> per-split accounting — expressed as ONE declarative plan so
Catalyst fuses the stages (the feature projections ride the dedup
join's scan; the split assignment is a zero-shuffle projection).

This is the integration surface over the per-operator pieces
(``dedup.exact_dedup``, ``textops.doc_features``,
``sampling.train_split``): what SURVEY.md §2.3 calls the
training-data north star, composed the way a user would actually run
it.  Scale: two doc_id-keyed shuffles (dedup groupBy + keeper join)
plus one tiny rollup — everything else is scan-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup
from .sampling import train_split
from .textops import doc_features

def corpus_prep(
    documents: DataFrame,
    *,
    min_tokens: int = 10,
    min_quality: float = 0.3,
    fracs: dict[str, float] | None = None,
) -> DataFrame:
    """Per-document pipeline result: ``(doc_id, lang, n_tokens,
    quality_score, split)`` for every document that (a) is its
    duplicate group's keeper (lowest doc_id per exact text hash) and
    (b) passes the token-count and quality thresholds.
    """
    keepers = exact_dedup(documents).select(F.col("keep_id").alias("doc_id"))
    kept = documents.join(keepers, "doc_id")
    feats = doc_features(kept).select("doc_id", "n_tokens", "quality_score")
    good = feats.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality_score") >= min_quality)
    )
    enriched = documents.select("doc_id", "lang").join(good, "doc_id")
    return train_split(enriched, fracs=fracs)

def corpus_prep_stats(documents: DataFrame, **kwargs) -> DataFrame:
    """Corpus accounting per (split, lang): document count, total
    whitespace tokens, mean quality.  Quality scores are exact
    multiples of 1e-6 (doc_features' fixed-point contract), so the
    mean is computed entirely in integer ppm — sum of longs, floor
    division by the count — making it order-independent AND free of
    the round-to-6-near-a-half engine divergence a decimal-summed
    double average can hit.
    """
    prep = corpus_prep(documents, **kwargs)
    qppm = F.round(F.col("quality_score") * 1000000.0).cast("long")
    return (
        prep.groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(qppm).alias("_qsum"),
        )
        .select(
            "split",
            "lang",
            "n_docs",
            "total_tokens",
            (F.expr("_qsum div n_docs") / F.lit(1000000.0)).alias("avg_quality"),
        )
    )
