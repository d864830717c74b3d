"""Local stand-in for the driver's correctness gate: run each registry
query on Spark AND its DuckDB oracle at a given sf, compare row count,
column names, and order-insensitive values. Usable as a module
(pytest) or CLI: python -m tests.harness [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
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


# Oracle output types the driver's typed/Arrow canonicalization widens in
# ways Python fetchall() silently masks: DuckDB exports HUGEINT/DECIMAL as
# decimal128, unsigned ints as wider types — so an oracle emitting any of
# these hashes differently from a bit-identical Spark int64/double even
# though fetchall() returns plain ints (the CORRECTNESS_r04/r05 two-round
# hash-red signature: rows green, schema green, hash red, zero local repro).
_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL",
                        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")

# Spark simpleString -> DuckDB type names that canonicalize identically.
_SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def check_oracle_types(spark_types, ocols, otypes):
    """Cross-engine wire-type audit. spark_types maps column name ->
    Spark simpleString; ocols/otypes come from a DuckDB relation
    (.columns / .types). Returns a list of problem strings — empty
    means every oracle column is hash-compatible with the Spark schema
    under typed/Arrow canonicalization."""
    problems = []
    for c, t in zip(ocols, otypes):
        ts = str(t).upper()
        if any(b in ts for b in _BANNED_ORACLE_TYPES):
            problems.append(
                f"{c}: oracle type {ts} diverges under Arrow "
                f"canonicalization — cast it (e.g. ::BIGINT)")
            continue
        st = spark_types.get(c)
        allowed = _SPARK_TO_DUCK.get(st) if st is not None else None
        if allowed is not None and ts not in allowed:
            problems.append(f"{c}: spark {st} vs oracle {ts}")
    return problems


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
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            # Spark-written table: a DIRECTORY of part files (the sf1
            # scaling probe); single driver-generated sf dirs are flat
            # files. DuckDB needs the glob for the directory form.
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')")
    try:
        rel = con.sql(q.sql)
        ocols_raw = list(rel.columns)
        otypes = list(rel.types)
        orows = rel.fetchall()
    finally:
        con.close()
    ocols = sorted(ocols_raw)
    if scols != ocols:
        return False, f"schema mismatch: spark={scols} oracle={ocols}"
    spark_types = {f.name: f.dataType.simpleString()
                   for f in sdf.schema.fields}
    type_problems = check_oracle_types(spark_types, ocols_raw, otypes)
    if type_problems:
        return False, "oracle type mismatch: " + "; ".join(type_problems)
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
    import os

    from pyspark.sql import SparkSession
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    # The CLI sweep runs at arbitrary sf, including sf0.1 where the
    # JVM default 1g driver heap OOMs mid-sweep and takes every later
    # query down with it — size the heap like bench.py/conftest do.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    results = run_all(spark, sf_dir, names)
    bad = [n for n, ok, _ in results if not ok]
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    sys.exit(1 if bad else 0)
