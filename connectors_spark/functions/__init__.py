"""Scalar / column function library (SURVEY.md §2.8 + §7 extensions).

Everything here returns `pyspark.sql.Column` built ONLY from JVM-side
built-ins (`pyspark.sql.functions`) so expressions stay inside
whole-stage codegen — no Python row-at-a-time UDFs in the hot path.

Each helper is written to be *oracle-reproducible*: the same value is
computable in ANSI-ish SQL (DuckDB) so the driver's correctness gate can
hash-compare results. That forces deterministic hashing (md5-based, not
JVM-seeded) and explicit double-precision arithmetic.
"""

from .text import (
    tokens,
    token_count,
    ngram_shingles,
    hash64,
    fingerprint,
    stopword_ratio,
    punct_ratio,
    lang_scores,
    lang_id,
    LANG_MARKERS,
    STOPWORDS_EN,
)
from .vectors import (
    dot_d,
    norm_d,
    cosine_d,
)

__all__ = [
    "tokens", "token_count", "ngram_shingles", "hash64", "fingerprint",
    "stopword_ratio", "punct_ratio", "lang_scores", "lang_id",
    "LANG_MARKERS", "STOPWORDS_EN",
    "dot_d", "norm_d", "cosine_d",
]
