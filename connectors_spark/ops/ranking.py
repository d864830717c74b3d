"""Document ranking: TF-IDF term weighting and BM25 query scoring.

Extension operators for the training-data-pipeline surface (SURVEY §7 P7):
corpus-quality filtering and retrieval-style dedup both need a relevance
weight per (doc, term). Everything here is built-in DataFrame algebra --
explode + two hash aggregations + a broadcast join -- so the plan is fully
codegen'd, shuffles exactly twice (by (doc_id, term), then by term), and
scales linearly with corpus size: at 100 TB the term dictionary stays
small (per-term aggregates), only the posting relation is big, and no
driver-side state exceeds two scalar aggregates (N, avgdl).

Tokenization matches functions.text.tokens (split on single space, empties
dropped) so DuckDB string_split oracles are bit-identical.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def term_postings(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf): term frequency per document."""
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens(text_col)).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def tfidf(docs: DataFrame, id_col: str = "doc_id",
          text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, df, tfidf) with idf = ln(N / df).

    Plain (unsmoothed) idf: deterministic and SQL-reproducible. The df
    aggregate reuses the postings relation -- (doc_id, term) is unique
    after the tf groupBy, so df is a cheap count per term.
    """
    post = term_postings(docs, id_col, text_col)
    n = docs.count()
    df_rel = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (post.join(df_rel, "term")
            .withColumn("tfidf",
                        F.col("tf") * F.log(F.lit(float(n)) / F.col("df")))
            .select("doc_id", "term", "tf", "df", "tfidf"))


def bm25(docs: DataFrame, query_terms: Sequence[str],
         id_col: str = "doc_id", text_col: str = "text",
         k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(doc_id, score): Okapi BM25 of each doc against ``query_terms``.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Only documents containing ≥1 query term appear (score > 0). The
    per-term df for the few query terms and the two corpus scalars
    (N, avgdl) are tiny; the only large relation is the postings of the
    query terms themselves, pre-filtered before the shuffle.
    """
    qterms: List[str] = list(dict.fromkeys(query_terms))
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        tokens(text_col).alias("__toks")))
    dl = toks.select("doc_id", F.size("__toks").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.avg("dl").alias("avgdl")).first()
    n, avgdl = float(stats["n"]), float(stats["avgdl"])

    post = (toks.select("doc_id", F.explode("__toks").alias("term"))
            .where(F.col("term").isin(qterms))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf")))
    df_rel = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    # df_rel has one row per query term -> broadcast; dl is corpus-sized
    # (one row per doc) -> ordinary shuffle join on doc_id.
    scored = (post.join(F.broadcast(df_rel), "term")
              .join(dl, "doc_id")
              .withColumn("__w", idf * (F.col("tf") * F.lit(k1 + 1.0))
                          / (F.col("tf") + F.lit(k1)
                             * (F.lit(1.0 - b)
                                + F.lit(b) * F.col("dl") / F.lit(avgdl)))))
    return (scored.groupBy("doc_id")
            .agg(F.sum("__w").alias("score")))


__all__ = ["term_postings", "tfidf", "bm25"]
