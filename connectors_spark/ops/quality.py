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

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens
from .dedup import _spread

_NGRAM_UDFS: dict = {}


def ngram_list(text, n: int) -> Column:
    """ALL word n-grams of a document, in order, WITH multiplicity
    (unlike `text.ngram_shingles`, which is distinct-only for dedup).
    Arrow-batched: re-measured r5 against the lambda-bound JVM
    expression (the shingle trick without array_distinct) — outputs
    bit-identical, Arrow ~10% faster on the documents explode+count
    path (0.43 vs 0.48 s min-of-4 at sf0.1), so the UDF stays. Split
    matches `tokens()` (single space, empties dropped) so string_split
    oracles agree."""
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
                             F.explode_outer(ngram_list("_text", n))
                             .alias("g"))
                 .where(F.col("g").isNotNull())
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

    tok = (df.select(F.col(id_col).alias("doc_id"),
                     F.explode_outer(tokens(F.col(text_col))).alias("w"))
           .where(F.col("w").isNotNull()))
    vocab = tok.groupBy("w").count()
    # normalizer via scalar aggregate + broadcast cross join, NOT a
    # global window: Window.partitionBy() funnels the whole vocab
    # through ONE task — fine at bench scale, a straggler on a
    # 100 TB corpus vocabulary (r14, guide §2.5). counts are longs, so
    # the total is exact under any summation order (hash-identical).
    tot = vocab.agg(F.sum("count").alias("_tot"))
    logp = (vocab.crossJoin(F.broadcast(tot))
            .select("w", (-F.log(F.col("count") /
                                 F.col("_tot"))).alias("_nll")))
    return (tok.join(F.broadcast(logp), "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.round(F.avg("_nll"), 6).alias("nll")))


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed n-gram importance resampling)
# ---------------------------------------------------------------------------

def dsir_importance_weights(df: DataFrame, target_cond,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            buckets: int = 256) -> DataFrame:
    """DSIR log importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram profile is, so a
    pretraining pipeline can importance-resample a web-scale corpus
    toward a quality/domain target without an external model.

    Features are unigrams + adjacent bigrams hashed into ``buckets``
    buckets (md5-derived hash64 % buckets — seedless, so a DuckDB
    oracle reproduces it bit-for-bit). Target (rows satisfying
    ``target_cond``, a boolean Column over ``df``'s columns) and raw
    (all rows) bucket histograms become add-1-smoothed multinomials;
    a document's weight is the sum over its feature INSTANCES of the
    round-6 per-bucket log-likelihood ratio ln(p_target/p_raw).

    Returns (doc_id, n_feat, logw), logw rounded to 6; documents with
    zero tokens drop out (no feature instances).

    Scale shape: two passes over the tokenized corpus — one map-side-
    combined histogram aggregate emitting ``buckets`` rows (the target
    flag rides the rows, so target + raw histograms are ONE agg), and
    one feature explode joined to the BROADCAST λ-table (buckets rows)
    then combined per doc. No corpus-sized shuffle carries strings:
    the explode keys are 8-byte bucket ids."""
    from pyspark.sql import Window

    from ..functions.text import hash64
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    big = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    base = _spread(df).select(F.col(id_col).alias("doc_id"),
                              target_cond.alias("_t"),
                     F.concat(toks, big).alias("_f"))
    fb = (base.select("doc_id", "_t", F.explode_outer("_f").alias("_g"))
          .where(F.col("_g").isNotNull())
          .select("doc_id", "_t",
                  (hash64("_g") % buckets).alias("b")))
    hist = fb.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("c_t"))
    w_all = Window.partitionBy()
    lam = hist.select(
        "b",
        F.round(F.log((F.col("c_t") + 1) /
                      (F.sum("c_t").over(w_all) + buckets)) -
                F.log((F.col("c_raw") + 1) /
                      (F.sum("c_raw").over(w_all) + buckets)),
                6).alias("lam"))
    return (fb.join(F.broadcast(lam), "b")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_feat"),
                 F.round(F.sum("lam"), 6).alias("logw")))


# ---------------------------------------------------------------------------
# Duplicated-span coverage (exact-substring dedup signal)
# ---------------------------------------------------------------------------

def dup_span_stats(df: DataFrame, L: int = 10, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document duplicated-span coverage — the deduplication signal
    of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better", exact substring matching at 50-token granularity):
    a position is COVERED when some length-``L`` token window starting
    at or before it occurs at least twice in the corpus. Returns
    (doc_id, n_tok, n_dup_grams, covered_tokens, dup_frac) — one row
    per document that HAS at least one duplicated window (clean docs
    emit nothing); dup_frac = covered/n_tok rounded to 6.

    Coverage is an interval union computed by a sweep, not per-token
    rows: duplicated windows at sorted positions p₁<p₂<… contribute
    min(L, p_{i+1}−p_i) each and the last contributes L, so the
    per-doc relation stays one row per duplicated window.

    Scale shape: one tokenize+posexplode pass (keys are 8-byte md5
    window hashes), one map-side-combined global count per hash, one
    hash-keyed join back (uniform keys — no skew), one doc-keyed
    window for the sweep. Everything is integer until the final
    rounded fraction.
    """
    from pyspark.sql import Window

    from ..functions.text import hash64

    base = _spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        token_count(F.col(text_col)).alias("n_tok"))
    grams = (base
             .select("doc_id", "n_tok",
                     F.posexplode(ngram_list("_text", L))
                     .alias("pos", "_g"))
             .select("doc_id", "n_tok", "pos", hash64("_g").alias("_h")))
    counts = grams.groupBy("_h").agg(F.count(F.lit(1)).alias("_n"))
    dup = (grams.join(counts.filter(F.col("_n") >= 2).select("_h"), "_h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    contrib = F.least(F.lit(L), F.coalesce(F.lead("pos").over(w)
                                           - F.col("pos"), F.lit(L)))
    return (dup.withColumn("_c", contrib)
            .groupBy("doc_id")
            .agg(F.max("n_tok").alias("n_tok"),
                 F.count(F.lit(1)).alias("n_dup_grams"),
                 F.sum("_c").alias("covered_tokens"))
            .select("doc_id", "n_tok", "n_dup_grams", "covered_tokens",
                    F.round(F.col("covered_tokens") /
                            F.col("n_tok"), 6).alias("dup_frac")))


def strip_dup_spans(df: DataFrame, L: int = 10, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """The Lee et al. 2021 dedup TRANSFORM: remove every token covered
    by a corpus-duplicated L-token window, keep the rest in order.
    Returns (doc_id, text) with fully-covered docs dropped.

    Plan shape: the duplicated-window relation (see dup_span_stats)
    explodes each window to its covered token positions (≤ L rows per
    duplicated window — linear, and only for DUPLICATED windows), the
    position-exploded corpus left-anti joins against it on
    (doc, position), and survivors reassemble with one doc-keyed
    aggregation. Docs with no duplicated window skip the anti-join via
    the join's own hash partitioning; everything stays O(total tokens).
    """
    from ..functions.text import hash64

    base = _spread(df).select(F.col(id_col).alias("doc_id"),
                              F.col(text_col).alias("_text"))
    grams = (base
             .select("doc_id",
                     F.posexplode(ngram_list("_text", L))
                     .alias("pos", "_g"))
             .select("doc_id", "pos", hash64("_g").alias("_h")))
    counts = grams.groupBy("_h").agg(F.count(F.lit(1)).alias("_n"))
    covered = (grams
               .join(counts.filter(F.col("_n") >= 2).select("_h"), "_h")
               .select("doc_id",
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + F.lit(L - 1))).alias("tpos"))
               .distinct())
    toks = (base
            .select("doc_id",
                    F.posexplode(tokens(F.col("_text")))
                    .alias("tpos", "tok")))
    kept = toks.join(covered, ["doc_id", "tpos"], "left_anti")
    return (kept.groupBy("doc_id")
            .agg(F.concat_ws(
                " ", F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                    lambda s: s.getField("tok"))).alias("text"))
            .where(F.length("text") > 0))


# ---------------------------------------------------------------------------
# Token-distribution entropy (lexical-diversity quality signal)
# ---------------------------------------------------------------------------

def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy (bits) of the token distribution —
    the standard lexical-diversity filter: word-soup and template spam
    (one token repeated) score near 0, natural prose scores high.
    Returns (doc_id, n_tok, entropy) for documents with ≥1 token.

    Computed as H = log2(n) − (Σ c·log2 c)/n — one formula over integer
    counts instead of n per-token divisions, so the floating-point op
    order is short and identical in the SQL oracle (and rounded to 6).

    Scale shape: explode tokens → (doc, token) count (map-side
    combined) → one doc-keyed aggregation. Shuffle volume O(total
    tokens) then O(distinct (doc, token)); no joins, no windows.
    """
    cnt = (df.select(F.col(id_col).alias("doc_id"),
                     F.explode_outer(tokens(F.col(text_col))).alias("w"))
           .where(F.col("w").isNotNull())
           .groupBy("doc_id", "w").count())
    return (cnt.groupBy("doc_id")
            .agg(F.sum("count").alias("n_tok"),
                 F.sum(F.col("count") * F.log2("count")).alias("_sc"))
            .select("doc_id", "n_tok",
                    F.round(F.log2("n_tok") -
                            F.col("_sc") / F.col("n_tok"), 6)
                    .alias("entropy")))


# ---------------------------------------------------------------------------
# PMI bigram collocations (corpus phrase mining)
# ---------------------------------------------------------------------------

def pmi_bigrams(df: DataFrame, min_count: int = 5, top: int = 50,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Top collocations by pointwise mutual information: bigrams whose
    observed frequency beats the independence assumption of their
    unigrams — PMI(a,b) = ln(p(ab) / (p(a)·p(b))) (Church & Hanks
    1990), the classic phrase-mining / tokenizer-seed pass over a
    pre-training corpus. Only bigrams with ≥ ``min_count`` occurrences
    rank (PMI's low-count bias), top ``top`` by (pmi DESC, bigram).

    Returns (bigram, n, pmi) with pmi rounded to 6 and the probability
    expression mirroring the SQL oracle's op order exactly.

    Scale shape: one tokenize pass feeds both relations — bigram counts
    (explode adjacent pairs, map-side-combined count) and unigram
    counts. Both are vocabulary-bounded (Heaps' law), so the
    bigram→unigram joins broadcast the unigram relation; the corpus
    totals ride on the count relations via tiny single-partition
    windows over VOCAB rows, never data rows (same shape as
    unigram_nll_scores). The final top-k sorts a min_count-filtered
    vocabulary relation, not the corpus.
    """
    from pyspark.sql import Window

    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("_text"))
    uni = (base.select(F.explode_outer(tokens(F.col("_text")))
                       .alias("w"))
           .where(F.col("w").isNotNull())
           .groupBy("w").count())
    # scalar-aggregate normalizers (exact long sums), not global
    # windows — same single-task-funnel reasoning as token_nll (r14)
    utot = uni.agg(F.sum("count").alias("_utot"))
    p_uni = (uni.crossJoin(F.broadcast(utot))
             .select("w", (F.col("count") / F.col("_utot")).alias("_p")))
    bi = (base.select(F.explode_outer(ngram_list("_text", 2))
                      .alias("bigram"))
          .where(F.col("bigram").isNotNull())
          .groupBy("bigram").agg(F.count(F.lit(1)).alias("n")))
    # p(ab)'s denominator is the total over ALL bigrams — the window
    # must run before the min_count filter, not over the filtered
    # relation.
    btot = bi.agg(F.sum("n").alias("_btot"))
    p_bi = (bi.crossJoin(F.broadcast(btot))
            .select("bigram", "n",
                    (F.col("n") / F.col("_btot")).alias("_pab"))
            .filter(F.col("n") >= min_count))
    parts = F.split(F.col("bigram"), " ")
    scored = (p_bi
              .withColumn("_a", parts.getItem(0))
              .withColumn("_b", parts.getItem(1))
              .join(F.broadcast(p_uni.select(F.col("w").alias("_a"),
                                             F.col("_p").alias("_pa"))),
                    "_a")
              .join(F.broadcast(p_uni.select(F.col("w").alias("_b"),
                                             F.col("_p").alias("_pb"))),
                    "_b")
              .select("bigram", "n",
                      F.round(F.log(F.col("_pab") /
                                    (F.col("_pa") * F.col("_pb"))), 6)
                      .alias("pmi")))
    return (scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(top))


def ngram_novelty(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct n-gram shingles that appear in NO other document. High
    novelty = genuinely fresh content; low novelty = the document is
    assembled from corpus-common material (template spam, scraped
    recombinations) even when no single pair crosses a dup threshold —
    the corpus-level complement to pairwise Jaccard/containment.

    Returns (doc_id, n_shingles, novel_shingles, novelty) for docs
    with ≥1 shingle; novelty rounded to 6.

    Scale shape: one explode of distinct shingles (hashed to 8 bytes),
    one map-side-combined count keyed by gram producing BOTH the
    total-occurrence count and — since shingles are distinct per doc —
    doc frequency in the same aggregate, one join back keyed by gram,
    one re-aggregation keyed by doc. Shuffle volume is O(total
    distinct shingles), the same budget as any dedup pass; no
    self-joins, no windows."""
    from pyspark.sql import functions as F

    from ..functions.text import hash64, ngram_shingles
    ex = (_spread(df).select(F.col(id_col).alias("_id"),
                             ngram_shingles(F.col(text_col), n)
                             .alias("_sh"))
          .select("_id", F.explode_outer("_sh").alias("_gs"))
          .where(F.col("_gs").isNotNull())
          .select("_id", hash64("_gs").alias("_g")))
    freq = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    return (ex.join(freq, "_g")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum((F.col("_df") == 1).cast("long"))
                 .alias("novel_shingles"))
            .select(F.col("_id").alias(id_col), "n_shingles",
                    "novel_shingles",
                    F.round(F.col("novel_shingles")
                            / F.col("n_shingles").cast("double"), 6)
                    .alias("novelty")))


def winsorize_stats(df: DataFrame, value_col: str, group_col: str,
                    lo: float = 0.05, hi: float = 0.95,
                    approx_accuracy: Optional[int] = None) -> DataFrame:
    """Per-group winsorization: clamp values into the group's
    [p_lo, p_hi] percentile band and report robust summary statistics —
    the standard companion to the MAD rule when a pipeline wants to
    KEEP heavy-tailed rows (length, score, token count) but stop a few
    extremes from dominating downstream means/budgets, rather than
    dropping them.

    Returns one row per group: (group, n, p_lo, p_hi, mean_raw,
    mean_winsorized, clipped_frac), all doubles rounded to 6.

    Scale shape: one percentile aggregation keyed by group (exact by
    default; ``approx_accuracy`` switches to percentile_approx for
    corpus-scale groups, same contract as `mad_outliers`), broadcast
    back, then one map-side-combinable aggregation of the clamped
    values — the corpus shuffles only by its group key."""
    from pyspark.sql import functions as F
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")

    def pct(col, q):
        if approx_accuracy is not None:
            return F.percentile_approx(col, F.lit(q),
                                       F.lit(approx_accuracy))
        return F.percentile(col, F.lit(q))

    v = F.col(value_col).cast("double")
    base = df.select(F.col(group_col).alias("_grp"), v.alias("_val"))
    bounds = (base.groupBy("_grp")
              .agg(pct("_val", lo).alias("_plo"),
                   pct("_val", hi).alias("_phi")))
    clamped = (base.join(F.broadcast(bounds), "_grp")
               .withColumn("_w", F.greatest(
                   F.col("_plo"),
                   F.least(F.col("_phi"), F.col("_val")))))
    return (clamped.groupBy("_grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.first("_plo"), 6).alias("p_lo"),
                 F.round(F.first("_phi"), 6).alias("p_hi"),
                 F.round(F.avg("_val"), 6).alias("mean_raw"),
                 F.round(F.avg("_w"), 6).alias("mean_winsorized"),
                 F.round(F.avg((F.col("_val") != F.col("_w"))
                               .cast("double")), 6)
                 .alias("clipped_frac"))
            .select(F.col("_grp").alias(group_col), "n", "p_lo", "p_hi",
                    "mean_raw", "mean_winsorized", "clipped_frac"))


def mad_outliers(df: DataFrame, value_col: str, group_col: str,
                 id_col: str = "doc_id", k: float = 3.0,
                 approx_accuracy: Optional[int] = None) -> DataFrame:
    """Robust per-group outlier flagging: a row is an outlier when its
    value deviates from the GROUP median by more than ``k`` times the
    group's median absolute deviation — the MAD rule, immune to the
    outliers themselves (unlike mean/stddev z-scores, where one 2 GB
    document inflates sigma until nothing else flags).

    Returns (id, group, value, group_median, group_mad, is_outlier).

    Scale shape: two map-side-combinable aggregations keyed by group
    with the group relations broadcast back — the corpus is never
    shuffled by anything but its group key, and never collected. The
    default EXACT percentile buffers each group's value vector inside
    the aggregate (group cardinality is sources/domains, not
    corpus-sized — fine to ~1e7 rows/group). ``approx_accuracy``
    switches both medians to ``percentile_approx`` (Greenwald-Khanna,
    O(accuracy) state per group regardless of group size) — the
    turnkey 100 TB mode: accuracy 10_000 bounds the rank error to
    ~0.01 % of the group, which moves the median by at most the value
    spread across that rank window (equivalence-tolerance test in
    tests/test_ops_pipeline.py)."""
    from pyspark.sql import functions as F

    def med_of(col):
        if approx_accuracy is not None:
            return F.percentile_approx(col, F.lit(0.5),
                                       F.lit(approx_accuracy))
        return F.percentile(col, F.lit(0.5))

    v = F.col(value_col).cast("double")
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(group_col).alias("_grp"),
                     v.alias("_val"))
    med = (base.groupBy("_grp")
           .agg(med_of("_val").alias("group_median")))
    dev = (base.join(F.broadcast(med), "_grp")
           .withColumn("_ad", F.abs(F.col("_val")
                                    - F.col("group_median"))))
    mad = (dev.groupBy("_grp")
           .agg(med_of("_ad").alias("group_mad")))
    return (dev.join(F.broadcast(mad), "_grp")
            .select(F.col("_id").alias(id_col),
                    F.col("_grp").alias(group_col),
                    F.col("_val").alias(value_col),
                    F.round("group_median", 6).alias("group_median"),
                    F.round("group_mad", 6).alias("group_mad"),
                    (F.abs(F.col("_val") - F.col("group_median"))
                     > F.lit(k) * F.col("group_mad"))
                    .alias("is_outlier")))
