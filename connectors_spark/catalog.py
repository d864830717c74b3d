"""SQL surface (SURVEY §7 P6; ≍ Flink DeltaCatalog,
flink/.../table/DeltaCatalog.java:135,274): name→path catalog that
registers Delta snapshots as Spark SQL views, so the full Spark SQL
dialect (joins, windows, CTEs, set ops — everything Catalyst offers)
runs over engine-managed tables.

Views are snapshot-consistent: each (re-)registration pins the current
(or requested) version's file set; refresh() re-pins after new commits.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from .table import DeltaTable


def read_delta(spark: SparkSession, path: str,
               version: Optional[int] = None,
               timestamp_ms: Optional[int] = None) -> DataFrame:
    """Snapshot read with optional time travel (T1/T2)."""
    return DeltaTable.for_path(spark, path).to_df(version=version,
                                                  timestamp_ms=timestamp_ms)


class DeltaCatalog:
    """Minimal name→path catalog with temp-view registration."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: Dict[str, str] = {}

    def register(self, name: str, path: str,
                 version: Optional[int] = None,
                 timestamp_ms: Optional[int] = None) -> None:
        self._tables[name] = path
        df = read_delta(self.spark, path, version, timestamp_ms)
        df.createOrReplaceTempView(name)

    def refresh(self, name: Optional[str] = None) -> None:
        """Re-pin view(s) to the latest snapshot."""
        names = [name] if name else list(self._tables)
        for n in names:
            self.register(n, self._tables[n])

    def table(self, name: str) -> DeltaTable:
        return DeltaTable.for_path(self.spark, self._tables[name])

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def drop(self, name: str) -> None:
        self._tables.pop(name, None)
        self.spark.catalog.dropTempView(name)
