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
    """Exact per-group top-k — skew-safe because Catalyst makes it so:
    a ``row_number()`` window with a rank filter plans a
    ``WindowGroupLimit`` BEFORE the shuffle (partial per-partition
    top-k, SPARK-37099, Spark ≥ 3.5), so every task forwards at most k
    rows per group it sees and a mega-group cannot funnel un-limited
    through one task. This is the same two-phase min-k device the LSH
    bucket cap hand-builds for aggregation contexts (dedup.py) —
    here the optimizer builds it from the declarative form.

    Measured before settling on this shape (round-7 A/B, 8M rows, 95%
    of them in one group, local[32]): this window plan 1.40 s vs
    3.83 s for a hand-rolled per-(group, partition)
    slice(array_sort(collect_list(struct))) two-phase — the partial
    group-limit wins on both constant factors and shuffle volume, so
    the hand-rolled variant was dropped. The partial limit is pinned
    in tests/test_plans.py; a Spark downgrade that loses it would
    fail that test, not silently regress.

    The total order is (order_col desc/asc, tie_cols asc, remaining
    columns asc) — total, so ranks are deterministic. Output carries
    (group_cols, tie_cols, order_col, remaining, rank 1..k)."""
    from pyspark.sql import Window

    rest = [c for c in df.columns
            if c not in group_cols and c != order_col
            and c not in tie_cols]
    order = ([F.desc(order_col)] if descending
             else [F.asc(order_col)])
    order += [F.asc(c) for c in tie_cols] + [F.asc(c) for c in rest]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("rank",
                          F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(*group_cols, *tie_cols, order_col, *rest, "rank"))


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
