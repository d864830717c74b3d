"""Distributed BPE merge training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

Classic byte-pair-encoding learns a merge table greedily: count
adjacent symbol pairs across the (weighted) word vocabulary, merge the
most frequent pair everywhere, repeat. This implements the training
loop Spark-first:

- the corpus collapses to the DISTINCT-word relation with counts (one
  map-side-combined aggregate — the 100 TB corpus becomes a
  vocabulary-sized relation, the same collapse every practical BPE
  trainer does);
- each round is one groupBy over exploded symbol pairs (weighted by
  word count) + a global top-1 (freq DESC, pair lexicographic — fully
  deterministic tie-break);
- the merge applies as a single string `replace` per word: word state
  is the symbol sequence encoded as \\x1f-wrapped symbols
  ("\\x1fh\\x1f\\x1fe\\x1f..."), so replacing
  "\\x1fl\\x1f\\x1fr\\x1f" -> "\\x1flr\\x1f" is exactly the
  left-to-right non-overlapping pair merge (consecutive occurrences
  keep their own delimiters, so "aaaa" merges to "aa","aa" in one
  pass), with no cross-symbol false matches.

The winning pair is collected per round (k tiny 1-row actions — the
same driver-loop precedent as kmeans_fit's centroids); everything
corpus-sized stays distributed. A DuckDB oracle unrolls the identical
rounds in SQL (queries/pipeline.py), so the learned merge table is
hash-compare-gated.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread

SEP = "\x1f"  # unit separator: never appears in the text corpora


def _word_states(df: DataFrame, text_col: str) -> DataFrame:
    """(word, c, state): distinct words with counts, state = each
    character wrapped in SEP markers."""
    from ..functions.text import tokens

    words = (_spread(df).select(F.explode_outer(tokens(F.col(text_col)))
                       .alias("word"))
             .where(F.col("word").isNotNull())
             .groupBy("word").agg(F.count(F.lit(1)).alias("c")))
    state = F.regexp_replace(F.col("word"), "(.)", f"{SEP}$1{SEP}")
    return words.withColumn("state", state)


def _pair_freqs(states: DataFrame) -> DataFrame:
    """(l, r, f): weighted adjacent-pair frequencies over word states."""
    syms = F.split(F.expr("substring(state, 2, length(state) - 2)"),
                   SEP + SEP)
    pairs = F.arrays_zip(F.slice(syms, 1, F.size(syms) - 1),
                         F.slice(syms, 2, F.size(syms) - 1))
    ex = (states.filter(F.size(syms) >= 2)
          .select("c", F.explode(pairs).alias("_p")))
    return (ex.groupBy(F.col("_p.0").alias("l"), F.col("_p.1").alias("r"))
            .agg(F.sum("c").alias("f")))


def bpe_train(df: DataFrame, k: int = 4,
              text_col: str = "text") -> List[Tuple[int, str, str, int]]:
    """Learn the first ``k`` BPE merges; returns
    [(step, left, right, pair_freq)] with step 1-based. Each round is
    one distributed aggregate + a 1-row collect of the argmax."""
    # The corpus is scanned ONCE: the vocabulary-sized word relation is
    # cached, and each round's replaces chain on top of it — without
    # this, every round's collect() re-runs the corpus tokenize +
    # distinct-word shuffle from raw input (k full scans for k merges).
    base = _word_states(df, text_col).persist()
    states = base
    merges: List[Tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        best = (_pair_freqs(states)
                .orderBy(F.desc("f"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best:
            break
        l, r, f = best[0]["l"], best[0]["r"], int(best[0]["f"])
        merges.append((step, l, r, f))
        pat = f"{SEP}{l}{SEP}{SEP}{r}{SEP}"
        rep = f"{SEP}{l}{r}{SEP}"
        states = states.withColumn(
            "state", F.replace(F.col("state"), F.lit(pat), F.lit(rep)))
    base.unpersist()
    return merges


def bpe_merge_table(spark, df: DataFrame, k: int = 4,
                    text_col: str = "text") -> DataFrame:
    """bpe_train as a DataFrame: (step, left, right, pair_freq)."""
    rows = bpe_train(df, k, text_col)
    from ..localrel import local_rows_df
    return local_rows_df(
        spark, rows, "step int, left string, right string, pair_freq long")


def bpe_subword_counts(df: DataFrame, merges: List[Tuple[int, str, str, int]],
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Apply a learned merge table to every document: per doc,
    (n_words, n_subwords) after the merges — the encode side of BPE.
    The k merges chain as k literal string replaces over the wrapped
    symbol state: pure JVM expressions, map-side only, no shuffle
    beyond the final per-doc aggregate. At 100 TB this runs at scan
    speed with the merge table closed over as literals."""
    from ..functions.text import tokens

    state = F.regexp_replace(F.col("_w"), "(.)", f"{SEP}$1{SEP}")
    for _step, l, r, _f in merges:
        state = F.replace(state,
                          F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                          F.lit(f"{SEP}{l}{r}{SEP}"))
    n_syms = F.size(F.split(F.expr("substring(_st, 2, length(_st) - 2)"),
                            SEP + SEP))
    ex = (_spread(df).select(F.col(id_col),
                             F.explode_outer(tokens(F.col(text_col)))
                             .alias("_w"))
          .where(F.col("_w").isNotNull())
          .withColumn("_st", state))
    return (ex.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(n_syms).alias("n_subwords")))
