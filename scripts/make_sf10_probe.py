#!/usr/bin/env python
"""Generate the 100x scaling-probe dataset (sf10) by keyed 10x
replication of the sf1 probe (VERDICT r11 #1) — BENCH/CLIFF probing
only, never correctness gates.

Same integrity rules as make_sf1_probe.py, with second-decade twists:

- key offsets use a 10^10 stride (sf1 keys stay below 10^9 + sf0.1
  key range), applied consistently across join sides;
- documents get a SECOND character-permutation family over a letter
  set DISJOINT from sf1's ("lucmfwypvb" vs "etaoinshrd"): composed
  rotations (i, j) are pairwise distinct across all 100 effective
  replicas, so no cross-replica text collapses into synthetic
  near-dup mass;
- embeddings get an independent cosine-phase perturbation per replica
  so clones don't stack into shared LSH buckets.

Usage: python scripts/make_sf10_probe.py [src] [out]
       (defaults /tmp/sf1 -> /tmp/sf10)
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPLICAS = 10
OFF = 10_000_000_000  # far above any sf1 key (sf1 tops out ~9.1e8)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def rep(name, key_cols, extra=None):
        df = spark.read.parquet(f"{src}/{name}.parquet")
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
        print(name, u.count(), flush=True)

    for name in ("region", "nation"):
        s = f"{src}/{name}.parquet"
        if os.path.isdir(s):
            shutil.copytree(s, f"{out}/{name}.parquet",
                            dirs_exist_ok=True)
        else:
            shutil.copy(s, f"{out}/{name}.parquet")

    rep("customer", ["c_custkey"])
    rep("supplier", ["s_suppkey"])
    rep("part", ["p_partkey"])
    rep("orders", ["o_orderkey", "o_custkey"])
    rep("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    rep("events", ["event_id", "user_id"])

    # disjoint from sf1's "etaoinshrd" family — composed rotations
    # stay pairwise distinct across the 100 effective replicas
    alpha2 = "lucmfwypvb"

    def perm_text(d, i):
        rot = alpha2[i:] + alpha2[:i]
        return d.withColumn("text", F.translate("text", alpha2, rot))
    rep("documents", ["doc_id"], extra=perm_text)

    def perturb_vec(d, i):
        if i == 0:
            return d
        return d.withColumn(
            "embedding",
            F.transform("embedding",
                        lambda x, j: x + F.cos(F.col("vec_id") * 17
                                               + j * 11 + i) * 0.3))
    rep("embeddings", ["vec_id"], extra=perturb_vec)
    print("done:", out, flush=True)


if __name__ == "__main__":
    main()
