"""Order-SENSITIVE gate check for the round-5 determinism sweep.

tests/harness.py compares values order-insensitively; this script
verifies the stronger property the sweep establishes: for every query
in GATE_SORT, the Spark implementation and the DuckDB oracle deliver
rows in the SAME order (so even a row-order-sensitive hash matches).

Usage: python scripts/check_gate_order.py [sf_dir] [name ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.harness import TABLES, _norm, check_oracle_types


def main():
    import duckdb
    from pyspark.sql import SparkSession
    from connectors_spark.queries import REGISTRY
    from connectors_spark.queries.registry import GATE_SORT

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or [n for n in REGISTRY if n in GATE_SORT]

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    for name in names:
        q = REGISTRY[name]
        if q.sql is None:
            print(f"SKIP {name}: rows-only", flush=True)
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(_norm(r[c]) for c in scols)
                     for r in sdf.collect()]
            con = duckdb.connect()
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"'{sf_dir}/{t}.parquet'")
            rel = con.sql(q.sql)
            ocols_raw = list(rel.columns)
            otypes = list(rel.types)
            oidx = [ocols_raw.index(c) for c in sorted(ocols_raw)]
            orows = [tuple(_norm(r[i]) for i in oidx)
                     for r in rel.fetchall()]
            con.close()
            spark_types = {f.name: f.dataType.simpleString()
                           for f in sdf.schema.fields}
            tp = check_oracle_types(spark_types, ocols_raw, otypes)
            if tp:
                print(f"FAIL {name}: oracle type mismatch {tp}", flush=True)
                bad.append(name)
                continue
            if srows == orows:
                print(f"PASS {name}: ordered-equal ({len(srows)} rows)",
                      flush=True)
            else:
                diffs = [(i, a, b) for i, (a, b)
                         in enumerate(zip(srows, orows)) if a != b][:3]
                print(f"FAIL {name}: order/value diff {diffs}", flush=True)
                bad.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: EXC {type(e).__name__}: {e}", flush=True)
            bad.append(name)

    print(f"\n{len(names) - len(bad)}/{len(names)} ordered-equal")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
