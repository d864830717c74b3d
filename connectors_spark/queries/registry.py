"""Query registry shared by __spark_entry__.py (correctness gate) and
bench.py (performance gate).

Each QueryDef binds a name to:
- fn(spark, sf_dir) -> DataFrame     — the Spark-first implementation
- sql: str | None                    — DuckDB oracle (None → rows-only)
- bench: bool                        — include in the sf0.1 benchmark

Determinism contract (hash-compare survives engine differences):
- every computed double is round()'ed in BOTH implementations,
- every top-k has a total tie-break order,
- hashing is md5-derived, never JVM/seeded.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]
    bench: bool = False


REGISTRY: Dict[str, QueryDef] = {}


def register(name: str, sql: Optional[str], bench: bool = False):
    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, sql, bench)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table; pin session timezone to UTC so
    timestamp semantics match the (timezone-naive) DuckDB oracle.

    events.ts has shipped as either parquet TIMESTAMP(MICROS) (read
    natively) or TIMESTAMP(NANOS) (Spark reads as raw long under
    legacy.parquet.nanosAsLong — truncate to micros, identical to
    DuckDB's nanos→micros truncation for positive epochs). Handle both
    so testdata regeneration can't break every events query."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # normalize to TIMESTAMP (UTC session) so downstream
            # window/watermark ops behave uniformly across variants
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Importing the suite modules populates REGISTRY.
from . import relational   # noqa: E402,F401
from . import pipeline     # noqa: E402,F401
from . import temporal     # noqa: E402,F401
from . import delta_demo   # noqa: E402,F401
