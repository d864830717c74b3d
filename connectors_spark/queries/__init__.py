"""Headline query suite: every entry is a (Spark DataFrame fn, DuckDB
oracle SQL) pair registered for the driver's correctness gate and for
bench.py. See registry.REGISTRY.
"""

from .registry import REGISTRY, QueryDef, load  # noqa: F401
