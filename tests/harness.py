"""Local stand-in for the driver's correctness gate: run each registry
query on Spark AND its DuckDB oracle at a given sf, compare row count,
column names, and order-insensitive values. Usable as a module
(pytest) or CLI: python -m tests.harness [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from typing import List, Optional, Tuple

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def compare(spark, sf_dir: str, name: str) -> Tuple[bool, str]:
    from connectors_spark.queries import REGISTRY
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    if q.sql is None:
        return True, f"rows-only ({len(srows)} rows)"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    try:
        res = con.execute(q.sql)
        ocols_raw = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()
    ocols = sorted(ocols_raw)
    if scols != ocols:
        return False, f"schema mismatch: spark={scols} oracle={ocols}"
    if len(srows) != len(orows):
        return False, f"rowcount mismatch: spark={len(srows)} oracle={len(orows)}"
    sset = sorted(tuple(_norm(r[c]) for c in scols) for r in srows)
    oidx = [ocols_raw.index(c) for c in ocols]
    oset = sorted(tuple(_norm(r[i]) for i in oidx) for r in orows)
    if sset != oset:
        diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(srows)} rows)"


def run_all(spark, sf_dir: str,
            names: Optional[List[str]] = None) -> List[Tuple[str, bool, str]]:
    from connectors_spark.queries import REGISTRY
    out = []
    for name in (names or list(REGISTRY)):
        try:
            ok, msg = compare(spark, sf_dir, name)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        out.append((name, ok, msg))
        print(("PASS " if ok else "FAIL ") + name + ": " + msg, flush=True)
    return out


if __name__ == "__main__":
    from pyspark.sql import SparkSession
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    results = run_all(spark, sf_dir, names)
    bad = [n for n, ok, _ in results if not ok]
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    sys.exit(1 if bad else 0)
