"""Skew mitigation: salted equi-join for heavy-hitter keys.

AQE's skew-join splitting (on by default in this engine) handles most
skew at runtime, but it only splits SORT-MERGE join partitions; a
broadcast-ineligible join against a side with a few pathological keys
(one user owning 10% of all events, a null-ish default key) can still
pin one task. `salted_join` removes the hotspot structurally:

- left rows get a deterministic salt in [0, n_salts) derived from
  xxhash64 of the whole row (content-stable, no RNG state),
- the right side is replicated once per salt (explode over a literal
  range — size × n_salts, so use it when right is the smaller side),
- the join key becomes (key, salt): each formerly-hot key now spreads
  over n_salts partitions.

Join OUTPUT is identical to the unsalted join (verified in tests); only
the partitioning of work changes. Cost model: replication multiplies
the right side's shuffle volume by n_salts — worth it when the hottest
key exceeds ~1/n_partitions of the left side.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(df: DataFrame, group_cols: List[str], order_col: str,
                 k: int = 5, descending: bool = True,
                 tie_cols: List[str] = ()) -> DataFrame:
    """Exact per-group top-k WITHOUT a window over the data: a
    ``row_number().over(partitionBy(group))`` window has no partial
    aggregation, so a mega-group (the skewed key this module exists
    for) funnels entirely through one task. Two-phase instead — the
    same exact min-k device as the LSH bucket cap (dedup.py):

    1. per (group, input partition): keep each group's k best rows via
       a map-side ``slice(array_sort(collect_list(struct)))`` — no
       task ever holds more than k rows per group it sees;
    2. merge the per-partition candidates and keep the global k best.

    Top-k of the union of per-partition top-ks IS the global top-k,
    so the result is exact under any partitioning. ``order_col`` must
    be numeric (descending uses arithmetic negation); the total order
    is (order_col desc/asc, tie_cols asc, remaining columns asc), and
    the output carries every input column plus ``rank`` (1..k).

    Shuffle volume: ≤ k rows per (group, partition) after phase 1 —
    bounded by k × fan-in per group, never by group size."""
    dtype = dict(df.dtypes)[order_col]
    if dtype in ("string", "boolean", "date", "timestamp"):
        raise ValueError(
            f"grouped_topk needs a numeric order column, got {dtype}")
    key = -F.col(order_col) if descending else F.col(order_col)
    rest = [c for c in df.columns
            if c not in group_cols and c != order_col
            and c not in tie_cols]
    s = F.struct(key.alias("_o"),
                 *[F.col(c) for c in tie_cols],
                 F.col(order_col),
                 *[F.col(c) for c in rest])
    local = (df.groupBy(*group_cols,
                        F.spark_partition_id().alias("_p"))
             .agg(F.slice(F.array_sort(F.collect_list(s)), 1, k)
                  .alias("_c")))
    merged = (local.groupBy(*group_cols)
              .agg(F.slice(F.array_sort(F.flatten(F.collect_list("_c"))),
                           1, k).alias("_c")))
    out = merged.select(*group_cols,
                        F.posexplode("_c").alias("_i", "_s"))
    return out.select(
        *group_cols,
        *[F.col(f"_s.{c}") for c in tie_cols],
        F.col(f"_s.{order_col}"),
        *[F.col(f"_s.{c}") for c in rest],
        (F.col("_i") + 1).cast("int").alias("rank"))


def salted_join(left: DataFrame, right: DataFrame, on: List[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join `left` ⋈ `right` on `on`, spreading each join key over
    `n_salts` shuffle partitions. Supported `how`: inner / left."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(n_salts)).cast("int")
    l = left.withColumn("_salt", salt)
    r = (right.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
         .withColumn("_salt", F.col("_salt").cast("int")))
    out = l.join(r, [*on, "_salt"], how)
    return out.drop("_salt")
