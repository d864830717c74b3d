"""CHECK constraints: stored in table configuration
(delta.constraints.<name>), validated on every data-adding commit with
SQL CHECK semantics (TRUE or NULL passes; only FALSE violates)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from connectors_spark.errors import DeltaError
from connectors_spark.expressions import Col, Lit
from connectors_spark.table import DeltaTable

CONF = {"delta.constraints.pos": "v >= 0"}


def test_create_with_constraint_rejects_bad_write(spark, tmp_path):
    t = DeltaTable.for_path(spark, str(tmp_path / "c1"))
    t.write(spark.createDataFrame([Row(k=1, v=5)]), configuration=CONF)
    with pytest.raises(DeltaError, match="CHECK constraint pos"):
        t.write(spark.createDataFrame([Row(k=2, v=-1)]))
    # nothing committed, table unchanged
    assert t.log.snapshot().version == 0
    assert t.to_df().count() == 1
    t.write(spark.createDataFrame([Row(k=3, v=0)]))
    assert t.to_df().count() == 2


def test_null_passes_check(spark, tmp_path):
    t = DeltaTable.for_path(spark, str(tmp_path / "c2"))
    t.write(spark.createDataFrame([Row(k=1, v=5)]), configuration=CONF)
    t.write(spark.createDataFrame([Row(k=2, v=None)],
                                  "k: long, v: long"))
    assert t.to_df().count() == 2


def test_update_and_merge_enforce_constraint(spark, tmp_path):
    t = DeltaTable.for_path(spark, str(tmp_path / "c3"))
    t.write(spark.createDataFrame([Row(k=1, v=5), Row(k=2, v=7)]),
            configuration=CONF)
    with pytest.raises(DeltaError, match="CHECK constraint pos"):
        t.update({"v": "-3"}, Col("k") == Lit(1))
    with pytest.raises(DeltaError, match="CHECK constraint pos"):
        t.merge(spark.createDataFrame([Row(k=9, v=-9)]), "t.k = s.k")
    assert t.log.snapshot().version == 0
    t.update({"v": "3"}, Col("k") == Lit(1))
    assert {r["v"] for r in t.to_df().collect()} == {3, 7}


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = DeltaTable.for_path(spark, str(tmp_path / "c4"))
    t.write(spark.createDataFrame([Row(k=1, v=-5)]))
    with pytest.raises(DeltaError, match="CHECK constraint pos"):
        t.add_constraint("pos", "v >= 0")
    t.add_constraint("k_pos", "k > 0")
    with pytest.raises(DeltaError, match="already exists"):
        t.add_constraint("k_pos", "k > 0")
    with pytest.raises(DeltaError, match="CHECK constraint k_pos"):
        t.write(spark.createDataFrame([Row(k=0, v=1)]))
    t.drop_constraint("k_pos")
    t.write(spark.createDataFrame([Row(k=0, v=1)]))
    assert t.to_df().count() == 2
