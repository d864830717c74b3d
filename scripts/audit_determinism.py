"""Determinism audit for the query registry (VERDICT r4 task #1).

For every registry query, report:
- sorted:   does the optimized plan end in a global Sort?
- doubles:  output columns of Double/Float type (must be round()'ed per
            the registry contract, queries/registry.py:9-11)

Usage: python scripts/audit_determinism.py [sf_dir]
"""
from __future__ import annotations

import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


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
    main()
