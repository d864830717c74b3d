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
