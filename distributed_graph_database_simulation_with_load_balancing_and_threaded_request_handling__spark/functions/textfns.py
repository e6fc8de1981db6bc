"""Text-analysis column expressions for the training-data pipeline:
tokenization, normalization, shingling, fingerprinting, quality
ratios.  Pure built-in-function compositions — vectorized JVM
execution, no Python in the hot path, and each has a direct ANSI-SQL
equivalent for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword list (order matters nowhere; membership only).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

def normalize_text(c: Column) -> Column:
    """Lowercase, collapse every non-alphanumeric run to one space,
    trim — the canonical form used by fingerprinting and shingling."""
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))

def tokens(c: Column) -> Column:
    """Whitespace tokenization (array<string>); empty text -> []."""
    t = F.split(F.trim(c), r"\s+")
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(t)

def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")

def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token estimate: count maximal runs of letters,
    digits, or single punctuation marks (a BPE-like regex segmentation
    without a learned vocabulary).  ``regexp_count`` keeps it JVM-side."""
    return F.regexp_count(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).cast("long")

def char_shingles_normed(norm: Column, n: int = 5) -> Column:
    """Distinct character n-grams of ALREADY-normalized text (the
    MinHash shingle set).  Texts shorter than n yield one shingle (the
    whole text) so every document has a nonempty set.

    ``norm`` must be a plain attribute column: expressions referenced
    inside a ``transform`` lambda are re-evaluated per element
    (higher-order functions are interpreted), so passing the
    ``normalize_text`` regexp here directly would run the regexp once
    per character position.  Stage it with a ``select`` first.
    """
    return F.when(F.length(norm) < n, F.array(norm)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(norm) - (n - 1)),
                lambda i: F.substring(norm, i, F.lit(n)),
            )
        )
    )


def char_shingles(c: Column, n: int = 5) -> Column:
    """char_shingles_normed over normalize_text — convenience form for
    small inputs / tests.  Hot paths must stage normalization first
    (see char_shingles_normed)."""
    return char_shingles_normed(normalize_text(c), n)

def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of the normalized text.  Robust to
    case/punctuation/whitespace variation; the cheap exact-near-dup
    key (Broder-style 'shingleprint' degenerate case)."""
    return F.md5(normalize_text(c))

def punct_count(c: Column) -> Column:
    """Punctuation character count (long) — the integer numerator of
    ``punct_ratio``, for fixed-point consumers."""
    return F.length(F.regexp_replace(c, r"[^.,;:!?'\"]", "")).cast("long")

def stopword_count(c: Column) -> Column:
    """Stopword token count (long) — the integer numerator of
    ``stopword_ratio``, for fixed-point consumers."""
    t = tokens(F.lower(c))
    return F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("long")

def punct_ratio(c: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty text)."""
    n = F.length(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        punct_count(c).cast("double") / n.cast("double")
    )

def stopword_ratio(c: Column) -> Column:
    """Stopword tokens / total tokens (0.0 for empty text)."""
    t = tokens(F.lower(c))
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        stopword_count(c).cast("double") / F.size(t).cast("double")
    )
