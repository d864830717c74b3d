"""Distributed n-gram language model: Stupid Backoff training and
per-document perplexity scoring.

The reference has no text operators (its domain is table storage,
SURVEY.md §0); this module is a §7 extension implementing the LM
quality-filter step of a pretraining curation pipeline the way the
literature actually runs it at scale: CCNet (Wenzek et al. 2020)
scores every document by perplexity under an LM trained on a target
corpus, and Brants et al. 2007 ("Large Language Models in Machine
Translation") showed that Stupid Backoff — count ratios with a fixed
backoff penalty, no normalized discounting — is the n-gram estimator
that trains as pure MapReduce counting, which makes it the natural
Spark formulation: every model relation is one map-side-combined
groupBy, and scoring is a handful of equi-joins.

Scoring rule (alpha = 0.4, the paper's constant), for token w with
predecessors w_p, w_pp drawn from TRAIN counts c1/c2/c3 over N train
tokens and V distinct train types:

    u(w)              = (c1(w) + 1) / (N + V)          add-one floor,
                                                       OOV-safe
    b(w | w_p)        = c2(w_p,w) / c1(w_p)    if seen
                        alpha * u(w)           otherwise
    t(w | w_pp,w_p)   = c3(w_pp,w_p,w) / c2(w_pp,w_p)  if seen
                        alpha * b(w | w_p)             otherwise

Position 0 of a document scores with u, position 1 with b, the rest
with t. A document's score is avg(-ln s) over its tokens — lower is
more target-like — plus the trigram-backoff count as a coverage
signal.

Scale shape: the three count relations are one tokenize pass each
(shared via the lag relation), all map-side combined. The unigram
relation is Heaps-bounded (vocab, not corpus) and broadcasts; bigram
and trigram relations are corpus-scale and join on their gram keys with
size-decided strategies — never force-broadcast, never collected. Gram
construction is a narrow array expression (no lag window, so the
corpus is never shuffled by doc_id just to see predecessors); the only
doc_id shuffle is the final per-doc average. Everything is O(total
tokens) through the count/join shuffles with no self-join blowup — the
same profile as Brants et al.'s MapReduce pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _spread

from ..functions.text import bind_once, tokens

ALPHA = 0.4


def _lagged_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, w, w_p, w_pp): position-indexed tokens with the
    one- and two-back predecessors. Built as a pure array expression
    (token array bound once via the single-element-transform trick,
    predecessors by element_at) and posexploded — NOT a lag window:
    this relation is consumed four times (c1/c2/c3 counts + scoring),
    and a window formulation would re-shuffle the whole corpus by
    doc_id on every recomputation, while a narrow expression recosts
    only CPU. Grams never cross a document boundary by construction."""
    def _build(tk):
        return F.transform(
            F.sequence(F.lit(1), F.size(tk)),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w"),
                F.when(i >= 2, F.element_at(tk, i - 1)).alias("w_p"),
                F.when(i >= 3, F.element_at(tk, i - 2)).alias("w_pp")))

    tk = tokens(F.col(text_col))
    trip = F.when(
        F.size(tk) >= 1,   # sequence(1, 0) would count DOWN, not empty
        bind_once(tk, _build))
    return (_spread(df).select(F.col(id_col).alias("doc_id"),
                               F.posexplode(trip).alias("pos", "g"))
            .select("doc_id", "pos", "g.w", "g.w_p", "g.w_pp"))


def train_stupid_backoff(lagged: DataFrame):
    """Count relations (c1, c2, c3, totals) from a lagged-token
    relation. totals is a single-row (n, v) DataFrame — the only
    driver-sized piece of the model."""
    c1 = lagged.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("c1"))
    c2 = (lagged.filter(F.col("w_p").isNotNull())
          .groupBy("w_p", "w")
          .agg(F.count(F.lit(1)).cast("double").alias("c2")))
    c3 = (lagged.filter(F.col("w_pp").isNotNull())
          .groupBy("w_pp", "w_p", "w")
          .agg(F.count(F.lit(1)).cast("double").alias("c3")))
    totals = c1.agg(F.sum("c1").alias("n"),
                    F.count(F.lit(1)).cast("double").alias("v"))
    return c1, c2, c3, totals


def stupid_backoff_scores(df: DataFrame, train_cond: Column,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Score EVERY document of ``df`` under a Stupid Backoff trigram
    LM trained on the ``train_cond`` subset (held-out docs exercise
    the backoff chain — unseen trigrams fall to bigrams, unseen words
    to the add-one unigram floor, so no score is ever infinite).

    Returns (doc_id, n_tok, sb_nll, n_backoff) for docs with ≥1
    token: mean -ln s rounded to 6, and how many trigram positions
    had to back off — a model-coverage signal a curation pipeline
    thresholds alongside the perplexity itself.
    """
    lagged = _lagged_tokens(df, id_col, text_col)
    c1, c2, c3, totals = train_stupid_backoff(
        _lagged_tokens(df.filter(train_cond), id_col, text_col))

    scored = (
        lagged
        .crossJoin(F.broadcast(totals))
        # vocab-bounded (Heaps) relations broadcast; gram relations
        # stay sort-merge on their keys
        .join(F.broadcast(c1), "w", "left")
        .join(F.broadcast(c1.select(F.col("w").alias("w_p"),
                                    F.col("c1").alias("c1_p"))),
              "w_p", "left")
        .join(c2, ["w_p", "w"], "left")
        .join(c2.select(F.col("w_p").alias("w_pp"),
                        F.col("w").alias("w_p"),
                        F.col("c2").alias("c2_ctx")),
              ["w_pp", "w_p"], "left")
        .join(c3, ["w_pp", "w_p", "w"], "left"))

    u = (F.coalesce(F.col("c1"), F.lit(0.0)) + 1.0) / \
        (F.col("n") + F.col("v"))
    b = F.when(F.col("c2").isNotNull(), F.col("c2") / F.col("c1_p")) \
        .otherwise(F.lit(ALPHA) * u)
    t = F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c2_ctx")) \
        .otherwise(F.lit(ALPHA) * b)
    s = F.when(F.col("pos") == 0, u).when(F.col("pos") == 1, b) \
        .otherwise(t)
    backoff = F.when((F.col("pos") >= 2) & F.col("c3").isNull(), 1) \
        .otherwise(0)

    return (scored
            .select("doc_id", (-F.log(s)).alias("_nll"),
                    backoff.alias("_bk"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.round(F.avg("_nll"), 6).alias("sb_nll"),
                 F.sum("_bk").cast("bigint").alias("n_backoff")))
