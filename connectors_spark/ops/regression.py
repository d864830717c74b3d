"""Distributed full-batch logistic regression (gradient descent).

The quality-classifier substrate of a training-data pipeline (the
fasttext-style quality filter of GPT-3/CCNet lineage, here trained
in-engine): a tiny linear model over cheap per-document features,
trained distributively over the corpus and applied as a pure
column expression.

Reference parity: none (delta-io/connectors has no ML operators); §7
extension, same family as ops/clustering.kmeans_fit.

Execution model — the textbook distributed full-batch GD iteration:

- **Gradient** is ONE map-side-combined aggregate per iteration: each
  row contributes (y − σ(w·x))·x_k for k features, partially combined
  per task before a k-column exchange. Shuffle volume per iteration is
  O(tasks × k) doubles, independent of corpus size.
- **Weights** are k doubles collected to the driver between iterations
  and closed over the next pass as literals — the same driver sync per
  iteration as Lloyd's algorithm, inherent and corpus-size-free.
- **Scoring** is a pure JVM column expression (no UDF, no shuffle).

Determinism (what makes a DuckDB oracle hash-match): weights start at
zero; each row's gradient contribution is rounded to 6 decimals, the
averaged gradient is rounded to 6, and the updated weight is rounded
to 6 — so the weight vector entering every iteration is an identical
1e-6 multiple in any engine or partitioning, and double-summation
order can shift an average only below the rounding grain.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(weights: Sequence[float], feature_cols: Sequence[str]) -> Column:
    z = F.lit(0.0)
    for w, c in zip(weights, feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(df: DataFrame, feature_cols: Sequence[str],
               label_col: str = "y", iters: int = 3,
               lr: float = 1.0) -> List[float]:
    """Train w (one weight per feature column; include a constant
    column for the bias) by ``iters`` full-batch GD steps:
    w_k ← round(w_k + lr · avg(round((y − σ(w·x))·x_k, 6)), 6).
    Labels are 0.0/1.0 in ``label_col``. Returns the weight list."""
    w = [0.0] * len(feature_cols)
    for _ in range(iters):
        p = sigmoid(_dot(w, feature_cols))
        resid = F.col(label_col) - p
        aggs = [F.round(F.avg(F.round(resid * F.col(c), 6)), 6).alias(c)
                for c in feature_cols]
        row = df.agg(*aggs).collect()[0]
        w = [round(wk + lr * row[c], 6)
             for wk, c in zip(w, feature_cols)]
    return w


def logreg_score(weights: Sequence[float],
                 feature_cols: Sequence[str]) -> Column:
    """σ(w·x) as a column expression, rounded to 6."""
    return F.round(sigmoid(_dot(weights, feature_cols)), 6)
