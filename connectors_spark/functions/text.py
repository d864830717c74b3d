"""Text-analysis column functions: tokenization, shingling, hashing,
fingerprinting, quality metrics, language-ID.

Everything here is pure `pyspark.sql.functions` expressions — JVM-side,
no Python workers anywhere in the text hot path. Shingling binds the
token array once as a higher-order-function lambda variable, which made
the JVM expression beat the Arrow pandas UDF it replaced (bit-identical
output, measured faster per pass, zero worker-scheduling overhead).

Determinism contract: hashes derive from md5 (identical across Spark,
DuckDB, and any engine), NOT xxhash64/murmur (seed/implementation
specific). `hash64` gives a uniform 60-bit integer usable for minhash
permutations and simhash bit sampling.
"""

from __future__ import annotations

from typing import Dict, List, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _c(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# --------------------------------------------------------------------------
# Tokenization & shingling
# --------------------------------------------------------------------------

def bind_once(col: Column, fn) -> Column:
    """Evaluate ``fn(col)`` with ``col`` bound ONCE as a lambda
    variable — the single-element-array transform trick. Inside
    higher-order functions Spark re-evaluates a repeated subexpression
    per element; binding it via ``transform`` over a one-element array
    makes it a lambda variable computed once per row. Caveat callers
    must guard themselves: ``F.sequence(1, n)`` counts DOWN when
    n < 1, so empty inputs need an explicit ``when`` around the bound
    expression."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    return F.filter(F.split(_c(text), " "), lambda t: t != F.lit(""))


def token_count(text: ColumnOrName) -> Column:
    return F.size(tokens(text))


def ngram_shingles(text: ColumnOrName, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>), first-occurrence
    order. Docs shorter than n words — and NULL text — yield an empty
    array (the NULL case is coalesced so `size()` is 0, never NULL,
    preserving the contract of the pandas UDF this replaced).

    Pure JVM expression — no Python workers in the dedup hot path. The
    token array is bound ONCE as a lambda variable (single-element-array
    transform trick), so the split+filter isn't re-evaluated per gram;
    grams come from `slice` + `concat_ws` over a `sequence` of start
    positions and `array_distinct` keeps first-occurrence order.
    Measured against the equivalent Arrow pandas UDF on the documents
    table: bit-identical output, ~1.6x faster per pass, and none of the
    Python-worker scheduling overhead that dominated multi-stage dedup
    plans at small scale. Token split matches `tokens()` exactly (split
    on single space, empties dropped), so SQL oracles derived from
    string_split stay bit-identical.
    """
    def _build(tk: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)))
        return (F.when(F.size(tk) >= n, F.array_distinct(grams))
                .otherwise(F.slice(tk, 1, 0)))
    return F.coalesce(bind_once(tokens(_c(text)), _build),
                      F.array().cast("array<string>"))


# --------------------------------------------------------------------------
# Deterministic hashing
# --------------------------------------------------------------------------

def hash64(s: ColumnOrName) -> Column:
    """Deterministic 60-bit non-negative hash of a string.

    First 15 hex chars of md5 parsed base-16 → fits in a BIGINT.
    DuckDB-oracle equivalent: ``('0x' || substring(md5(s),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(_c(s)), 1, 15), 16, 10).cast("long")


def fingerprint(text: ColumnOrName) -> Column:
    """Canonical document fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed). Exact-dedup key."""
    norm = F.regexp_replace(F.trim(F.lower(_c(text))), r"\s+", " ")
    return F.md5(norm)


def kgram_hashes(text: ColumnOrName, k: int = 8) -> Column:
    """Rolling character k-gram hashes of the normalized text
    (array<long>, positional order preserved). Docs shorter than k chars
    yield a single whole-text hash. One codegen'd expression — each gram
    is hashed exactly once; window selection over these hashes belongs in
    a window function (see ops.dedup.winnow_overlap_pairs), NOT a nested
    array expression, which would re-evaluate the whole array per window
    (O(m²) hashing)."""
    def _build(t: Column) -> Column:
        m = F.length(t) - k + 1         # number of k-grams
        grams = F.transform(F.sequence(F.lit(1), m),
                            lambda i: hash64(t.substr(i, F.lit(k))))
        return F.when(m >= 1, grams).otherwise(F.array(hash64(t)))
    # bind_once: the normalized text is a regexp over the raw column —
    # without binding it would be re-evaluated per gram
    return bind_once(
        F.regexp_replace(F.trim(F.lower(_c(text))), r"\s+", " "),
        _build)


# --------------------------------------------------------------------------
# Quality metrics
# --------------------------------------------------------------------------

STOPWORDS_EN: List[str] = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that",
]


def stopword_ratio(text: ColumnOrName,
                   stopwords: List[str] = STOPWORDS_EN) -> Column:
    """Fraction of tokens that are stopwords (0.0 when no tokens)."""
    t = tokens(text)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0,
                  hits.cast("double") / F.size(t).cast("double")
                  ).otherwise(F.lit(0.0))


def punct_ratio(text: ColumnOrName) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    low = F.lower(_c(text))
    stripped = F.regexp_replace(low, "[a-z0-9 ]", "")
    return F.when(F.length(low) > 0,
                  F.length(stripped).cast("double") /
                  F.length(low).cast("double")).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# Language ID (marker-word heuristic)
# --------------------------------------------------------------------------

# Small high-frequency marker lists per language. A real system would use
# character n-gram models; the heuristic keeps the whole computation as a
# vectorized Catalyst expression — and is exactly reproducible in SQL.
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "is", "to", "with"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}


def lang_scores(text: ColumnOrName,
                markers: Dict[str, List[str]] = LANG_MARKERS
                ) -> Dict[str, Column]:
    t = tokens(text)
    out: Dict[str, Column] = {}
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    return out


def lang_id(text: ColumnOrName,
            markers: Dict[str, List[str]] = LANG_MARKERS) -> Column:
    """argmax language by marker-hit count; ties and all-zero → 'en'.

    Deterministic tie-break: languages compared in sorted-name order,
    strict `>` needed to displace the incumbent.
    """
    scores = lang_scores(text, markers)
    langs = sorted(markers)
    best_lang = F.lit("en")
    best_score = scores[langs[0]] * 0  # typed zero
    for lang in langs:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("en"))


def regex_tokens(text: ColumnOrName,
                 pattern: str = r"[a-z]+|[0-9]+|[^a-z0-9\s]") -> Column:
    """BPE-style pre-tokenization: lowercased runs of letters, runs of
    digits, and single punctuation marks (whitespace dropped) — the
    coarse split GPT-ish byte-pair tokenizers apply before merges.
    Codegen'd `regexp_extract_all`; the pattern class is dialect-neutral
    (identical under Java regex and RE2/DuckDB)."""
    return F.regexp_extract_all(F.lower(_c(text)), F.lit(pattern), F.lit(0))


# PII patterns: dialect-neutral (identical semantics under Java regex and
# DuckDB's RE2): no backrefs, no lookaround, no \b at class edges.
PII_PATTERNS: List = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(text: ColumnOrName) -> Column:
    """Replace emails, URLs, and phone-ish digit runs with typed
    placeholder tokens — the standard pre-training scrub pass. Order
    matters (emails before phones so digits inside addresses don't
    half-match); each pattern is one codegen'd regexp_replace."""
    out = _c(text)
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def hash_split(key: ColumnOrName, train: int = 80, val: int = 10) -> Column:
    """Deterministic dataset split label ('train' | 'val' | 'test') from
    the md5-derived hash of a key column, bucketed mod 100. Reproducible
    across engines, runs, and repartitioning — unlike randomSplit, a
    row's split never depends on partitioning or seed plumbing, and the
    assignment is stable when the corpus grows."""
    b = hash64(_c(key).cast("string")) % 100
    return (F.when(b < train, F.lit("train"))
            .when(b < train + val, F.lit("val"))
            .otherwise(F.lit("test")))
