"""Parallel JDBC → Delta import (reference S9: sql-delta-import).

Mirrors JDBCImport.readJDBCSourceInParallel
(sql-delta-import/src/main/scala/JDBCImport.scala:76-94): probe
min/max of the split column, hand Spark's built-in JDBC source the
bounds so N executors each pull one range chunk, apply caller
transforms (DataTransforms.scala:1-33), then overwrite the target
Delta table (:100-105).

Scale: the chunking IS the parallelism — `num_chunks` should be sized
so each chunk is a few hundred MB of source rows; Spark's JDBC source
issues one range-predicate query per partition, so the database sees
bounded, index-friendly scans.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

Transform = Callable[[DataFrame], DataFrame]


def apply_transforms(df: DataFrame,
                     transforms: Iterable[Transform]) -> DataFrame:
    """Fold caller DataFrame→DataFrame transforms (≍ DataTransforms)."""
    for t in transforms:
        df = t(df)
    return df


def read_jdbc_in_parallel(spark: SparkSession, url: str, table: str,
                          split_by: str, num_chunks: int = 10,
                          properties: Optional[Dict[str, str]] = None
                          ) -> DataFrame:
    """Range-partitioned parallel JDBC read.

    Probes ``SELECT min(c), max(c)`` with a single-partition read, then
    reads the table with (column, lowerBound, upperBound, numPartitions)
    so each Spark partition fetches one range chunk.
    """
    props = dict(properties or {})
    # ANSI-quote the split column: Spark's JDBC writer creates tables with
    # quoted (case-preserved) identifiers, so an unquoted probe would be
    # case-folded by the database and miss the column. MySQL-style engines
    # need `identifierQuote` in properties (consumed here, not passed on).
    q = props.pop("identifierQuote", '"')
    qcol = f"{q}{split_by}{q}"
    bounds = (spark.read
              .jdbc(url,
                    f"(SELECT min({qcol}) AS {q}lo{q}, max({qcol}) AS "
                    f"{q}hi{q} FROM {table}) AS b",
                    properties=props)
              .first())
    if bounds is None or bounds[0] is None:
        return spark.read.jdbc(url, table, properties=props)
    return spark.read.jdbc(
        url, table, column=split_by,
        lowerBound=int(bounds[0]), upperBound=int(bounds[1]) + 1,
        numPartitions=num_chunks, properties=props)


def import_to_delta(spark: SparkSession, url: str, table: str,
                    split_by: str, target_path: str,
                    num_chunks: int = 10,
                    partition_by: Optional[Sequence[str]] = None,
                    transforms: Iterable[Transform] = (),
                    properties: Optional[Dict[str, str]] = None,
                    mode: str = "overwrite") -> int:
    """JDBC table → Delta table; returns committed version."""
    from ..table import DeltaTable

    df = read_jdbc_in_parallel(spark, url, table, split_by, num_chunks,
                               properties)
    df = apply_transforms(df, transforms)
    return DeltaTable.for_path(spark, target_path).write(
        df, mode=mode, partition_by=partition_by)
