"""Pin the oracle wire-type audit (VERDICT r5 task #2).

CORRECTNESS_r04/r05 went hash-red on exactly two queries because their
DuckDB oracles emitted an uncast HUGEINT (sum(BIGINT) -> INT128): Python
fetchall() degrades HUGEINT to int, so every local comparison passed,
while the driver's typed/Arrow canonicalization (HUGEINT -> decimal128)
hashed Decimal('123') != int64 123. These tests guarantee the local
harness now FAILS on that bug class instead of masking it.
"""

import duckdb
import pytest

from tests.harness import check_oracle_types


def _rel_types(sql):
    con = duckdb.connect()
    try:
        rel = con.sql(sql)
        return list(rel.columns), list(rel.types)
    finally:
        con.close()


def test_uncast_sum_bigint_fails():
    # DuckDB sum(BIGINT) returns HUGEINT — the exact r4/r5 bug shape.
    cols, types = _rel_types(
        "SELECT sum(x) AS s FROM (SELECT 1::BIGINT AS x)")
    problems = check_oracle_types({"s": "bigint"}, cols, types)
    assert problems and "HUGEINT" in problems[0]


def test_windowed_sum_derivative_fails():
    # HUGEINT // int stays HUGEINT (doc_pack_sequences' seq_id shape).
    cols, types = _rel_types(
        "SELECT sum(x) OVER () // 256 AS seq_id FROM "
        "(SELECT 5::BIGINT AS x)")
    problems = check_oracle_types({"seq_id": "bigint"}, cols, types)
    assert problems and "HUGEINT" in problems[0]


def test_cast_to_bigint_passes():
    cols, types = _rel_types(
        "SELECT sum(x)::BIGINT AS s FROM (SELECT 1::BIGINT AS x)")
    assert check_oracle_types({"s": "bigint"}, cols, types) == []


def test_decimal_and_unsigned_fail():
    cols, types = _rel_types(
        "SELECT 1.5::DECIMAL(10,2) AS d, 3::UINTEGER AS u")
    problems = check_oracle_types({"d": "double", "u": "int"}, cols, types)
    assert len(problems) == 2


def test_width_mismatch_fails():
    # Spark int vs oracle BIGINT canonicalize to different Arrow widths.
    cols, types = _rel_types("SELECT 1::BIGINT AS n")
    problems = check_oracle_types({"n": "int"}, cols, types)
    assert problems and "spark int vs oracle BIGINT" in problems[0]


def test_matching_scalar_types_pass():
    cols, types = _rel_types(
        "SELECT 'a' AS s, 1::BIGINT AS b, 2::INTEGER AS i, "
        "1.5::DOUBLE AS d, TRUE AS f, DATE '2024-01-01' AS dt, "
        "TIMESTAMP '2024-01-01 00:00:00' AS ts")
    spark_types = {"s": "string", "b": "bigint", "i": "int",
                   "d": "double", "f": "boolean", "dt": "date",
                   "ts": "timestamp"}
    assert check_oracle_types(spark_types, cols, types) == []


def test_full_registry_oracles_are_type_clean():
    """Census every registered oracle's output types against its
    declared gate columns: no banned types anywhere. This is the
    standing guard that a future oracle edit can't reintroduce the
    r4/r5 bug class. Uses sf0.001 for speed (types don't depend on
    data volume)."""
    from connectors_spark.queries import REGISTRY
    from tests.harness import TABLES

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf_dir}/{t}.parquet'")
        offenders = []
        for name, q in REGISTRY.items():
            if q.sql is None:
                continue
            rel = con.sql(q.sql)
            # Empty spark_types skips width checks: the census enforces
            # exactly the SAME banned-type scan the harness runs (one
            # implementation, so the two can't drift).
            for p in check_oracle_types({}, rel.columns, rel.types):
                offenders.append(f"{name}.{p}")
        assert offenders == [], offenders
    finally:
        con.close()
