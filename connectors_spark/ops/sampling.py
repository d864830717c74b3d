"""Deterministic sampling operators for corpus curation.

Priority sampling (Duffield, Lund, Thorup: "Priority sampling for
estimation of arbitrary subset sums", JACM 2007): each row gets
priority w_i / u_i with u_i uniform in (0, 1]; the k largest priorities
form a weighted-without-replacement sample with unbiased subset-sum
estimators. Here u_i derives from the md5 hash of the row id, so the
sample is a pure function of (ids, weights, k):

- reproducible across engines/runs/partitionings (no RNG state),
- stable under corpus growth — adding rows can only displace rows whose
  priority is beaten, never reshuffle survivors among themselves,
- expressible in ANY engine (one window), so a SQL oracle can pin the
  exact selected set.

Shuffle cost: one global top-k (window on a constant key collapses to a
single partition — fine for k up to ~10⁶; for larger k, partial top-k
per partition first, same as cosine_topk's local-reduce pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash64

_2_60F = float(1 << 60)


def priority_col(id_col: str, weight_col: str) -> Column:
    """priority = weight / u, u = (hash64(id)+1) / 2^60 ∈ (0, 1]."""
    u = (hash64(F.col(id_col).cast("string")) + 1) / F.lit(_2_60F)
    return F.col(weight_col).cast("double") / u


def priority_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str) -> DataFrame:
    """The k rows with largest hash-randomized priority (ties broken by
    id): a deterministic weighted-without-replacement sample."""
    w = Window.orderBy(F.desc("_prio"), F.asc(id_col))
    return (df.withColumn("_prio", priority_col(id_col, weight_col))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_prio", "_rn"))


def stratified_sample(df: DataFrame, strata_col: str, fractions,
                      id_col: str) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    hash64(id) mod 10000 < fraction·10000 for its stratum's fraction.

    ``fractions`` is either one float for every stratum or a
    {stratum_value: fraction} dict (strata absent from the dict are
    dropped). A pure filter -- no shuffle, no RNG state, no window: each
    partition decides its rows independently, so the operator scales
    embarrassingly and the selected set is a pure function of (ids,
    fractions), reproducible by any engine with md5 (SQL oracle included).

    Per-stratum counts are binomial around fraction·n_stratum, exactly as
    with rand()-based Bernoulli sampling, but stable across runs."""
    bucket = hash64(F.col(id_col).cast("string")) % 10000
    if isinstance(fractions, dict):
        # flat CASE: stratum value -> its threshold, unknown strata -> 0
        thresh = F.lit(0)
        for value, frac in sorted(fractions.items(), reverse=True):
            thresh = F.when(F.col(strata_col) == F.lit(value),
                            F.lit(int(frac * 10000))).otherwise(thresh)
    else:
        thresh = F.lit(int(float(fractions) * 10000))
    return df.where(bucket < thresh)


def mixture_weights(df: DataFrame, group_col: str = "source",
                    alpha: float = 0.5,
                    budget: int = 1000) -> DataFrame:
    """Temperature-based corpus mixing weights: per-group sampling
    probability p_i ∝ n_i^alpha — the standard multilingual /
    multi-source rebalancing (alpha=1 is proportional, alpha→0 uniform;
    mBERT/XLM-R use alpha≈0.7, many pre-training mixes 0.5). Returns
    (group, n_docs, weight, expected_docs) with weight = n^α / Σ n^α
    and expected_docs = weight·budget, both rounded to 6.

    Scale shape: one map-side-combined count per group; the normalizer
    is a window over the GROUP relation (one row per source — tiny by
    definition), never over data rows. Feed the weights to
    `stratified_sample` (fractions = expected_docs / n_docs) to realize
    the mix deterministically.
    """
    w_all = Window.partitionBy()
    counts = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    pw = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    return counts.select(
        "group", "n_docs",
        F.round(pw / F.sum(pw).over(w_all), 6).alias("weight"),
        F.round(pw / F.sum(pw).over(w_all) * F.lit(float(budget)), 6)
        .alias("expected_docs"))
