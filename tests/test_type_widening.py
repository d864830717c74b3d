"""Type widening (Delta protocol 'Type Widening').

Metadata-only ALTER COLUMN TYPE to a wider type: old files keep the
narrow physical type; Spark's parquet reader promotes at scan time
(verified natively: int32 -> long, float -> double, decimal precision
growth). The reference predates the feature; implemented from the
published protocol spec section 'Type Widening'.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from connectors_spark.errors import DeltaError
from connectors_spark.expressions import Col, Lit
from connectors_spark.table import DeltaTable
from connectors_spark.txn import is_type_widening

CFG = {"delta.enableTypeWidening": "true",
       "delta.protocol.autoUpgrade": "true"}


def _mk(spark, path):
    t = DeltaTable.for_path(spark, str(path))
    df = spark.range(10).select(
        F.col("id").cast("int").alias("a"),
        (F.col("id") * 1.5).cast("float").alias("b"),
        F.col("id").cast("string").alias("s"))
    t.write(df, configuration=CFG)
    return t


def test_widening_matrix():
    B, S, I, L = T.ByteType(), T.ShortType(), T.IntegerType(), \
        T.LongType()
    FL, D, ST = T.FloatType(), T.DoubleType(), T.StringType()
    ok = [(I, L), (B, S), (B, L), (S, I), (FL, D)]
    bad = [(L, I), (D, FL), (I, I), (ST, L), (I, D), (L, D)]
    for f, t_ in ok:
        assert is_type_widening(f, t_), (f, t_)
    for f, t_ in bad:
        assert not is_type_widening(f, t_), (f, t_)
    assert is_type_widening(T.DecimalType(5, 2), T.DecimalType(10, 2))
    assert not is_type_widening(T.DecimalType(5, 2), T.DecimalType(10, 4))
    assert not is_type_widening(T.DecimalType(10, 2), T.DecimalType(5, 2))


def test_widen_then_mixed_file_read_and_skipping(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.alter_column_type("a", "long")
    t.alter_column_type("b", "double")
    t.write(spark.range(10, 20).select(
        F.col("id").alias("a"), (F.col("id") * 1.5).alias("b"),
        F.col("id").cast("string").alias("s")), mode="append")
    out = t.to_df()
    assert dict((f.name, f.dataType.simpleString())
                for f in out.schema.fields) \
        == {"a": "bigint", "b": "double", "s": "string"}
    rows = sorted((r.a, r.b) for r in out.collect())
    assert rows == [(i, i * 1.5) for i in range(20)]
    # stats skipping stays sound across the narrow/wide file mix:
    # min/max written as int in old files, long in new ones
    sc = t.scan(Col("a") > Lit(15))
    assert sc.to_df().count() == 4
    assert len(sc.collect_files()) < len(t.log.snapshot().all_files())
    # protocol carries the reader feature (foreign legacy readers must
    # refuse rather than misread the mixed physical types)
    p = t.log.snapshot().protocol
    assert "typeWidening" in (p.readerFeatures or [])
    f = next(f for f in t.log.snapshot().metadata.schema.fields
             if f.name == "a")
    assert (f.metadata or {}).get("delta.typeChanges")


def test_widening_requires_property_and_rejects_narrowing(spark,
                                                          tmp_path):
    t = DeltaTable.for_path(spark, str(tmp_path / "plain"))
    t.write(spark.range(5).select(F.col("id").cast("int").alias("a"),
                                  F.col("id").alias("v")))
    with pytest.raises(DeltaError, match="enableTypeWidening"):
        t.alter_column_type("a", "long")
    t2 = _mk(spark, tmp_path / "t2")
    with pytest.raises(DeltaError, match="widening"):
        t2.alter_column_type("a", "short")
    with pytest.raises(DeltaError, match="widening"):
        t2.alter_column_type("s", "long")


def test_write_time_evolution_cannot_sneak_type_changes(spark,
                                                        tmp_path):
    """The widening allowance is DDL-scoped in effect: a plain append
    whose frame carries a wider type still goes through
    _check_schema_evolution — allowed ONLY when the property is on;
    an un-opted table keeps refusing."""
    t = DeltaTable.for_path(spark, str(tmp_path / "t"))
    t.write(spark.range(5).select(F.col("id").cast("int").alias("a"),
                                  F.col("id").alias("v")))
    from connectors_spark.errors import DeltaError as DE
    with pytest.raises(DE, match="cannot change type"):
        import dataclasses
        import json as _json
        txn = t.log.start_transaction()
        meta = txn.snapshot.metadata
        fields = [T.StructField("a", T.LongType(), True),
                  T.StructField("v", T.LongType(), True)]
        txn.update_metadata(dataclasses.replace(
            meta, schemaString=_json.dumps(
                T.StructType(fields).jsonValue())))
        txn.commit([], operation="WRITE")


def test_widening_survives_checkpoint(spark, tmp_path):
    from connectors_spark.log.checkpoints import write_checkpoint
    t = _mk(spark, tmp_path / "t")
    t.alter_column_type("a", "long")
    write_checkpoint(t.log.snapshot())
    t.write(spark.range(10, 15).select(
        F.col("id").alias("a"),
        (F.col("id") * 1.5).cast("float").alias("b"),
        F.col("id").cast("string").alias("s")), mode="append")
    rows = sorted(r.a for r in t.to_df().collect())
    assert rows == list(range(15))
    f = next(f for f in t.log.snapshot().metadata.schema.fields
             if f.name == "a")
    assert (f.metadata or {}).get("delta.typeChanges")
