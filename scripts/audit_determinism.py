"""Determinism audit for the query registry (VERDICT r4 task #1).

For every registry query, report:
- sorted:   does the optimized plan end in a global Sort?
- doubles:  output columns of Double/Float type (must be round()'ed per
            the registry contract, queries/registry.py:9-11)

Usage: python scripts/audit_determinism.py [sf_dir]
       python scripts/audit_determinism.py --sync [sf_dir]

--sync regenerates the GATE_COLUMNS literal from the ACTUAL output
schema of every gate query (via fn.__wrapped__, so it works even while
the registered wrapper is raising on a stale list) and prints it to
stdout for pasting into queries/registry.py. The gate wrapper raises
on any column missing from the list, so a drifted list fails loudly in
tests (tests/test_registry_gate.py) and this is the repair tool.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SYNC = "--sync" in sys.argv[1:]
SF = ARGS[0] if ARGS else "/root/testdata/sf0.001"


def sync():
    from pyspark.sql import SparkSession
    from connectors_spark.queries import REGISTRY
    from connectors_spark.queries.registry import GATE_SORT

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    print("GATE_COLUMNS: Dict[str, list] = {")
    for name in REGISTRY:
        if name not in GATE_SORT:
            continue
        fn = getattr(REGISTRY[name].fn, "__wrapped__", REGISTRY[name].fn)
        try:
            cols = fn(spark, SF).columns
        except Exception as e:  # noqa: BLE001
            # Keep the PREVIOUS entry rather than dropping it — pasting
            # a partial regeneration must never delete a valid list.
            from connectors_spark.queries.registry import GATE_COLUMNS
            prev = GATE_COLUMNS.get(name)
            if prev is not None:
                print(f"    {name!r}: {list(prev)!r},  "
                      f"# KEPT (regen failed: {type(e).__name__})")
            failed.append(f"{name}: {type(e).__name__}: {e}")
            continue
        print(f"    {name!r}: {list(cols)!r},")
    print("}")
    if failed:
        for f in failed:
            print(f"SYNC-ERROR {f}", file=sys.stderr)
        sys.exit(1)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import types as T
    from connectors_spark.queries import REGISTRY

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    unsorted, with_doubles = [], []
    for name, q in REGISTRY.items():
        try:
            df = q.fn(spark, SF)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        plan = df._jdf.queryExecution().optimizedPlan()
        top = plan.getClass().getSimpleName()
        # Walk through order-preserving unary nodes: a Sort under a
        # Project/Limit chain still fixes the delivered row order.
        node = plan
        while node.getClass().getSimpleName() in (
                "Project", "GlobalLimit", "LocalLimit", "Filter"):
            node = node.children().head()
        nm = node.getClass().getSimpleName()
        is_sorted = nm == "Sort" and getattr(node, "global")()
        dbl = [f.name for f in df.schema.fields
               if isinstance(f.dataType, (T.DoubleType, T.FloatType))]
        flag = []
        if not is_sorted:
            unsorted.append(name)
            flag.append(f"UNSORTED(top={top})")
        if dbl:
            with_doubles.append(name)
            flag.append(f"doubles={dbl}")
        print(f"{name}: {' '.join(flag) or 'ok'}")

    print(f"\nunsorted ({len(unsorted)}): {unsorted}")
    print(f"\nwith doubles ({len(with_doubles)}): {with_doubles}")


if __name__ == "__main__":
    sync() if SYNC else main()
