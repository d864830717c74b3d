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
