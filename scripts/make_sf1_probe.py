#!/usr/bin/env python
"""Generate a 10x scaling-probe dataset (sf1) from sf0.1 by keyed
replication — for BENCH RATIO measurement only (VERDICT r9 #6), never
for correctness gates (those stay on the driver-generated sf dirs).

Replication preserves the distribution shapes the headline queries
stress while keeping referential integrity:

- fact/dim tables replicate 10x with disjoint key offsets applied
  consistently on both sides of every join (l_orderkey<->o_orderkey,
  o_custkey<->c_custkey, l_suppkey<->s_suppkey, l_partkey<->p_partkey,
  events.user_id);
- region/nation stay fixed (real TPC-H scales them O(1) too);
- documents get a per-replica character permutation (translate) so
  cross-replica texts are NOT near-duplicates — otherwise every doc
  gains 9 clones and the dedup pair expansion measures a synthetic
  100x dup blowup instead of 10x data;
- embeddings get a deterministic per-replica perturbation so clones
  don't stack into the same LSH buckets for the same reason.

Usage: python scripts/make_sf1_probe.py [out_dir] (default /tmp/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 100_000_000  # key offset per replica — far above any sf0.1 key


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def rep(name, key_cols, extra=None):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(REPLICAS):
            d = df
            for c in key_cols:
                d = d.withColumn(c, F.col(c) + F.lit(i * OFF))
            if extra is not None:
                d = extra(d, i)
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(name, u.count())

    for name in ("region", "nation"):
        shutil.copytree(f"{SRC}/{name}.parquet",
                        f"{out}/{name}.parquet", dirs_exist_ok=True) \
            if os.path.isdir(f"{SRC}/{name}.parquet") else \
            shutil.copy(f"{SRC}/{name}.parquet", f"{out}/{name}.parquet")

    rep("customer", ["c_custkey"])
    rep("supplier", ["s_suppkey"])
    rep("part", ["p_partkey"])
    rep("orders", ["o_orderkey", "o_custkey"])
    rep("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    rep("events", ["event_id", "user_id"])

    # per-replica character permutation: rotate the 10 most common
    # lowercase letters by i — deterministic, JVM-side, kills
    # cross-replica shingle identity while preserving intra-replica
    # dup structure exactly
    alpha = "etaoinshrd"

    def perm_text(d, i):
        rot = alpha[i:] + alpha[:i]
        return d.withColumn("text", F.translate("text", alpha, rot))
    rep("documents", ["doc_id"], extra=perm_text)

    def perturb_vec(d, i):
        if i == 0:
            return d
        return d.withColumn(
            "embedding",
            F.transform("embedding",
                        lambda x, j: x + F.sin(F.col("vec_id") * 31
                                               + j * 7 + i) * 0.3))
    rep("embeddings", ["vec_id"], extra=perturb_vec)
    print("done:", out)


if __name__ == "__main__":
    main()
