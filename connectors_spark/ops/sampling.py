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


def mixture_allocate(df: DataFrame, group_col: str = "source",
                     alpha: float = 0.5,
                     budget: int = 1000) -> DataFrame:
    """Integer quota per group summing EXACTLY to ``budget`` —
    largest-remainder (Hamilton) apportionment over the temperature
    weights: quota_i = floor(budget·w_i) plus one extra for the groups
    with the largest fractional parts (ties to group name asc) until
    the remainder is spent. Deterministic, and unlike expected_docs the
    quotas are directly usable as per-source sample sizes.

    Scale shape: every op after the initial count runs on the GROUP
    relation (one row per source); the two windows (normalizer sum,
    remainder rank) are over that tiny relation, never data rows."""
    w_all = Window.partitionBy()
    counts = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    pw = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    # _exact is rounded to 6 BEFORE floor/frac: pow and the unordered
    # normalizer sum are doubles, and an unrounded value one ulp either
    # side of an integer would flip floor() (and the remainder rank)
    # between engines or runs — the same libm-boundary class the
    # histogram sketch avoids with bit arithmetic.
    ex = counts.select(
        "group", "n_docs",
        F.round(pw / F.sum(pw).over(w_all) * F.lit(float(budget)), 6)
        .alias("_exact"))
    base = ex.select(
        "group", "n_docs",
        F.floor("_exact").cast("long").alias("_base"),
        (F.col("_exact") - F.floor("_exact")).alias("_frac"))
    rem = F.lit(budget) - F.sum("_base").over(w_all)
    rk = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("_frac"), F.asc("group")))
    return (base.withColumn("_rk", rk).withColumn("_rem", rem)
            .select("group", "n_docs",
                    (F.col("_base")
                     + (F.col("_rk") <= F.col("_rem")).cast("long"))
                    .alias("quota")))


def epoch_shuffle(df: DataFrame, seed: int = 1, id_col: str = "doc_id",
                  range_bits: int = 6) -> DataFrame:
    """Deterministic global shuffle order for one training epoch:
    pos = rank of (hash64('ep{seed}:'||id), id) — a reproducible
    pseudo-random permutation of the corpus, identical on every rerun
    and engine (the oracle is a plain ROW_NUMBER over the hash).

    Scale shape: the global rank is computed WITHOUT a global sort.
    The 60-bit hash is range-bucketed by its top ``range_bits`` bits
    (buckets are contiguous hash ranges, so bucket-major order IS hash
    order); pass 1 counts per bucket (tiny relation) and prefix-sums
    the offsets, pass 2 ranks within each bucket in parallel and adds
    the bucket offset — the same two-pass block-offset scheme as
    pack_sequences, no SinglePartition exchange on data rows."""
    hv = hash64(F.concat(F.lit(f"ep{seed}:"),
                         F.col(id_col).cast("string")))
    bucket = F.shiftright(hv, 60 - range_bits)
    h = df.select(F.col(id_col), hv.alias("_hv"),
                  bucket.alias("_bkt"))
    counts = h.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
    offs = counts.select(
        "_bkt",
        (F.sum("_n").over(Window.partitionBy().orderBy("_bkt"))
         - F.col("_n")).alias("_off"))
    local = F.row_number().over(
        Window.partitionBy("_bkt").orderBy(F.asc("_hv"),
                                           F.asc(id_col))) - 1
    return (h.withColumn("_lrk", local)
            .join(offs, "_bkt")
            .select(id_col,
                    (F.col("_off") + F.col("_lrk")).alias("pos")))


def group_sample(df: DataFrame, group_col: str, k: int,
                 id_col: str = "doc_id", n_salts: int = 64) -> DataFrame:
    """EXACTLY min(k, |group|) rows per group, deterministic: the k
    smallest ``hash64(id)`` values win (ties impossible — the hash is
    keyed by the unique id, and id breaks any residual tie). The
    uniform per-group quota complements `stratified_sample`
    (fractional, binomial counts) and `mixture_allocate` (corpus-level
    quotas): per-source eval sets, few-shot pools, debugging slices.

    Scale shape: a naive ``row_number() OVER (PARTITION BY group)``
    puts EVERY row of a group into one task — the hottest source
    becomes a straggler at corpus scale. Two phases instead: phase 1
    ranks within (group, salt) — ``n_salts`` bounded sub-partitions
    per group — keeping ≤ k rows each; phase 2 ranks the surviving
    ≤ k·n_salts rows per group. Both windows are over BOUNDED
    partitions; the result is exactly the global per-group top-k
    because every global winner also wins its salt bucket."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    prio = hash64(F.col(id_col).cast("string"))
    base = df.withColumn("_prio", prio) \
             .withColumn("_salt", F.pmod(F.col("_prio"), F.lit(n_salts)))
    w1 = Window.partitionBy(group_col, "_salt") \
        .orderBy(F.asc("_prio"), F.asc(id_col))
    stage1 = (base.withColumn("_rn", F.row_number().over(w1))
              .where(F.col("_rn") <= k).drop("_rn"))
    w2 = Window.partitionBy(group_col) \
        .orderBy(F.asc("_prio"), F.asc(id_col))
    return (stage1.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") <= k)
            .drop("_rn", "_prio", "_salt"))
