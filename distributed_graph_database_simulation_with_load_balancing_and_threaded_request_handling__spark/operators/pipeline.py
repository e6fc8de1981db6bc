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
    whitespace tokens, mean quality.  Decimal-summed quality keeps the
    average bit-stable under any partitioning (see relational._DEC).
    """
    prep = corpus_prep(documents, **kwargs)
    q = F.col("quality_score").cast("decimal(18,6)")
    return prep.groupBy("split", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.sum(q).cast("double") / F.count("*"), 6).alias("avg_quality"),
    )
