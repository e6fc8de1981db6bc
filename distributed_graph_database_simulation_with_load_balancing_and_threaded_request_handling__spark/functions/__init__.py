"""Reusable column expressions — all JVM-side (built-in
pyspark.sql.functions compositions, no Python UDFs) so they stay
inside whole-stage codegen."""

from .textfns import (
    normalize_text,
    tokens,
    token_count,
    char_shingles,
    char_shingles_normed,
    fingerprint,
    punct_ratio,
    stopword_ratio,
)
from .vectors import as_double_vec, dot, l2_norm, cosine_sim
from .hashing import band_hashes, pack_sign_bits

__all__ = [
    "normalize_text",
    "tokens",
    "token_count",
    "char_shingles",
    "char_shingles_normed",
    "fingerprint",
    "punct_ratio",
    "stopword_ratio",
    "as_double_vec",
    "dot",
    "l2_norm",
    "cosine_sim",
    "band_hashes",
    "pack_sign_bits",
]
