"""Checkpointing, change feed, and DML behavior."""

from __future__ import annotations

import os

import pytest
# Integration-heavy: excluded from the fast inner loop (pytest -m "not slow");
# the full suite still runs these unchanged at round close-out (SURVEY 5).
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from connectors_spark import DeltaTable
from connectors_spark.errors import DeltaError
from connectors_spark.expressions import Col
from tests.conftest import read_table


def test_checkpoint_written_and_read(spark, tmp_path):
    nation = read_table(spark, "nation")
    t = DeltaTable.for_path(spark, str(tmp_path / "ck"))
    # 12 single-row commits -> checkpoint at version 10
    rows = nation.limit(12).collect()
    for i, r in enumerate(rows):
        df = spark.createDataFrame([r], nation.schema)
        t.write(df, mode="append")
    log_dir = os.path.join(t.path, "_delta_log")
    names = os.listdir(log_dir)
    assert any("checkpoint" in n for n in names), names
    assert "_last_checkpoint" in names
    # full read sees all 12 rows
    assert t.to_df().count() == 12
    # snapshot built FROM the checkpoint (delete early jsons' visibility):
    snap = t.log.snapshot_for_version(10)
    assert snap.segment.checkpoint_version == 10
    assert snap.to_df().count() == 11


def test_changes_df(spark, tmp_path):
    orders = read_table(spark, "orders")
    t = DeltaTable.for_path(spark, str(tmp_path / "cd"))
    t.write(orders.where("o_orderstatus = 'F'"))
    t.write(orders.where("o_orderstatus = 'O'"), mode="append")
    t.write(orders.where("o_orderstatus = 'P'"), mode="append")
    ch = t.changes_df(start_version=1)
    n_o = orders.where("o_orderstatus = 'O'").count()
    n_p = orders.where("o_orderstatus = 'P'").count()
    assert ch.count() == n_o + n_p
    per_v = {r["_commit_version"]: r["n"] for r in
             ch.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()}
    assert per_v == {1: n_o, 2: n_p}


def test_changes_validation(spark, tmp_path):
    orders = read_table(spark, "orders")
    t = DeltaTable.for_path(spark, str(tmp_path / "cv"))
    # partitioned so a partition-predicate DELETE is a pure remove commit
    t.write(orders.where("o_orderstatus = 'F'"),
            partition_by=["o_orderstatus"])
    t.write(orders.where("o_orderstatus = 'O'"), mode="append")
    t.delete(Col("o_orderstatus") == "F")  # version 2: delete-only
    with pytest.raises(DeltaError):
        t.changes_df(start_version=1).count()
    # ignore_deletes lets the stream skip the delete-only version
    n = t.changes_df(start_version=1, ignore_deletes=True).count()
    assert n == orders.where("o_orderstatus = 'O'").count()


def test_changes_rejects_rewrites_unless_ignore_changes(spark, tmp_path):
    cust = read_table(spark, "customer")
    t = DeltaTable.for_path(spark, str(tmp_path / "cw"))
    t.write(cust)
    t.update({"c_acctbal": F.lit(0.0)}, Col("c_mktsegment") == "BUILDING")
    with pytest.raises(DeltaError):
        t.changes_df(start_version=1).count()
    # ignore_changes streams the rewritten files' rows
    n = t.changes_df(start_version=1, ignore_changes=True).count()
    assert n > 0


def test_update(spark, tmp_path):
    cust = read_table(spark, "customer")
    t = DeltaTable.for_path(spark, str(tmp_path / "up"))
    t.write(cust)
    t.update({"c_acctbal": F.col("c_acctbal") + 100.0},
             Col("c_mktsegment") == "BUILDING")
    got = t.to_df()
    want = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_mktsegment") == "BUILDING",
               F.col("c_acctbal") + 100.0).otherwise(F.col("c_acctbal")))
    assert got.count() == cust.count()
    a = got.agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0]
    b = want.agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0]
    assert a == b


def test_merge_upsert(spark, tmp_path):
    cust = read_table(spark, "customer")
    t = DeltaTable.for_path(spark, str(tmp_path / "mg"))
    t.write(cust)
    n0 = cust.count()
    # source: update acctbal for 10 existing customers, insert 5 new ones
    updates = (cust.limit(10)
               .withColumn("c_acctbal", F.lit(999.0)))
    inserts = (cust.limit(5)
               .withColumn("c_custkey", F.col("c_custkey") + 1_000_000))
    src = updates.unionByName(inserts)
    t.merge(src, "t.c_custkey = s.c_custkey",
            when_matched_update={"c_acctbal": "s.c_acctbal"},
            when_not_matched_insert=True)
    out = t.to_df()
    assert out.count() == n0 + 5
    assert out.where("c_acctbal = 999.0").count() >= 10
    assert out.where("c_custkey >= 1000000").count() == 5


def test_merge_delete(spark, tmp_path):
    cust = read_table(spark, "customer")
    t = DeltaTable.for_path(spark, str(tmp_path / "md"))
    t.write(cust)
    victims = cust.limit(20).select("c_custkey")
    t.merge(victims, "t.c_custkey = s.c_custkey",
            when_matched_delete=True, when_not_matched_insert=False)
    assert t.to_df().count() == cust.count() - 20
