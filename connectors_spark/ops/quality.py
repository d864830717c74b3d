"""Repetition-based document quality metrics (Gopher-style filters).

The reference has no text operators (its domain is table storage,
SURVEY.md §0); this module is a §7 extension implementing the
repetition heuristics from the Gopher paper (Rae et al. 2021, §A1.1:
"Repetition removal") that a pre-training curation pipeline applies
before dedup: documents dominated by one repeated n-gram or by
duplicated n-grams are machine-generated boilerplate and get dropped.

Scale shape: one explode of token n-grams (with multiplicity), one
shuffle keyed (doc_id, gram) for per-gram counts, one map-side-combined
re-aggregation keyed doc_id. Shuffle volume is O(total tokens), same
as any tokenize pass; no self-joins, no windows.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

_NGRAM_UDFS: dict = {}


def ngram_list(text, n: int) -> Column:
    """ALL word n-grams of a document, in order, WITH multiplicity
    (unlike `text.ngram_shingles`, which is distinct-only for dedup).
    Arrow-batched for the same measured reason as the shingle UDF:
    Spark interprets nested higher-order functions, a linear Python
    loop per Arrow batch is ~5x faster. Split matches `tokens()`
    (single space, empties dropped) so string_split oracles agree."""
    from pyspark.sql.types import ArrayType, StringType

    if n not in _NGRAM_UDFS:
        @F.pandas_udf(ArrayType(StringType()))
        def _ng(texts: pd.Series) -> pd.Series:
            out = []
            for s in texts:
                tk = [w for w in (s or "").split(" ") if w]
                out.append([" ".join(tk[i:i + n])
                            for i in range(len(tk) - n + 1)])
            return pd.Series(out)
        _NGRAM_UDFS[n] = _ng
    return _NGRAM_UDFS[n](text if isinstance(text, Column) else F.col(text))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     ns: Sequence[int] = (2, 3)) -> DataFrame:
    """Per-document repetition metrics, one row per input document:

    - ``n_tok``: token count;
    - ``top{n}_frac``: fraction of the document's n-grams accounted for
      by its single most frequent n-gram (Gopher's "fraction of
      characters in most common n-gram", at token granularity);
    - ``dup{n}_frac``: fraction of n-gram occurrences whose gram occurs
      more than once ("fraction of characters in duplicated n-grams").

    Documents with fewer than n tokens get 0.0 for that n (nothing is
    repeated in an empty gram list). Fractions are rounded to 6 places
    so double-precision division order can't break oracle equality.
    """
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("_text"),
                     F.size(tokens(F.col(text_col))).alias("n_tok"))
    out = base.select("doc_id", "n_tok")
    for n in ns:
        grams = (base.select("doc_id",
                             F.explode(ngram_list("_text", n)).alias("g"))
                 .groupBy("doc_id", "g").count())
        stats = (grams.groupBy("doc_id")
                 .agg(F.max("count").alias("_mx"),
                      F.sum("count").alias("_tot"),
                      F.sum(F.when(F.col("count") > 1, F.col("count"))
                            .otherwise(F.lit(0))).alias("_dup"))
                 .select("doc_id",
                         F.round(F.col("_mx") / F.col("_tot"), 6)
                         .alias(f"top{n}_frac"),
                         F.round(F.col("_dup") / F.col("_tot"), 6)
                         .alias(f"dup{n}_frac")))
        out = (out.join(stats, "doc_id", "left")
               .fillna(0.0, [f"top{n}_frac", f"dup{n}_frac"]))
    return out


# Gopher §A1.1 thresholds (token-granularity analogues). A document
# PASSES when every metric is under its cap.
GOPHER_CAPS = {"top2_frac": 0.20, "top3_frac": 0.18,
               "dup2_frac": 0.60, "dup3_frac": 0.50}
GOPHER_MIN_TOKENS = 5


def gopher_filter(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """repetition_stats + a boolean ``keep``: tokens ≥ GOPHER_MIN_TOKENS
    and every repetition metric strictly under its GOPHER_CAPS cap."""
    stats = repetition_stats(df, id_col, text_col)
    cond = F.col("n_tok") >= F.lit(GOPHER_MIN_TOKENS)
    for col, cap in GOPHER_CAPS.items():
        cond = cond & (F.col(col) < F.lit(cap))
    return stats.withColumn("keep", cond)


# ---------------------------------------------------------------------------
# Corpus-LM quality scoring (CCNet-style, unigram)
# ---------------------------------------------------------------------------

def unigram_nll_scores(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram language model — the CCNet quality signal (Wenzek et al.
    2020 score with a KenLM model; the unigram LM is its deterministic,
    external-model-free analogue): word-soup and boilerplate score low
    (common tokens), rare-token noise scores high.

    Returns (doc_id, n_tok, nll) for documents with ≥1 token; ``nll``
    is avg(-ln p(token)) rounded to 6.

    Scale shape: the vocabulary relation is corpus-bounded (Heaps' law
    — millions of rows, not corpus-sized), so the token→logprob join
    broadcasts; the corpus is tokenized once and shuffled once for the
    per-doc average (map-side combined). The corpus total token count
    rides on the vocab relation via one tiny single-partition window
    over vocab rows — never over data rows.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens(F.col(text_col))).alias("w"))
    vocab = tok.groupBy("w").count()
    w_all = Window.partitionBy()
    logp = vocab.select(
        "w", (-F.log(F.col("count") /
                     F.sum("count").over(w_all))).alias("_nll"))
    return (tok.join(F.broadcast(logp), "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.round(F.avg("_nll"), 6).alias("nll")))
