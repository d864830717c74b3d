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


# ---------------------------------------------------------------------------
# Checkpoint-write crash safety (VERDICT r12 #7): write_checkpoint publishes
# parquet parts FIRST, then the _last_checkpoint pointer. Every interruption
# point must leave a loadable table: parts present + pointer absent (crash
# between the two), pointer STALE (crash before the update), and a torn
# multi-part set (only some parts landed — segment completeness A4 must
# reject it and fall back).
# ---------------------------------------------------------------------------

def _mk_checkpointed(spark, path, n=12):
    nation = read_table(spark, "nation")
    t = DeltaTable.for_path(spark, str(path))
    for r in nation.limit(n).collect():
        t.write(spark.createDataFrame([r], nation.schema), mode="append")
    return t


def test_checkpoint_crash_pointer_absent(spark, tmp_path):
    t = _mk_checkpointed(spark, tmp_path / "ck")
    log_dir = os.path.join(t.path, "_delta_log")
    os.remove(os.path.join(log_dir, "_last_checkpoint"))
    t2 = DeltaTable.for_path(spark, str(tmp_path / "ck"))
    assert t2.to_df().count() == 12
    # the listing found the checkpoint without the hint
    assert t2.log.snapshot().segment.checkpoint_version == 10


def test_checkpoint_crash_pointer_stale(spark, tmp_path):
    """A pointer that still names an OLDER checkpoint (crash before the
    update) must not hide newer commits or the newer checkpoint."""
    from connectors_spark.log.segment import (read_last_checkpoint,
                                              write_last_checkpoint)
    t = _mk_checkpointed(spark, tmp_path / "ck", n=12)
    lc = read_last_checkpoint(t.log.store, t.log.log_path)
    assert lc is not None and lc.version == 10
    # grow past the next checkpoint (20), then roll the pointer BACK
    nation = read_table(spark, "nation")
    for r in nation.limit(25).collect()[12:]:
        t.write(spark.createDataFrame([r], nation.schema), mode="append")
    write_last_checkpoint(t.log.store, t.log.log_path, 10, lc.size,
                          parts=lc.parts)
    t2 = DeltaTable.for_path(spark, str(tmp_path / "ck"))
    assert t2.to_df().count() == 25
    assert t2.log.snapshot().version == 24


def test_checkpoint_crash_torn_multipart(spark, tmp_path):
    """Only SOME parts of a multi-part checkpoint landed: completeness
    (A4) must reject the torn set and replay from the previous complete
    checkpoint (or the full json tail)."""
    from connectors_spark.log import filenames as fn
    t = _mk_checkpointed(spark, tmp_path / "ck", n=12)
    from connectors_spark.log.checkpoints import write_checkpoint
    snap = t.log.snapshot()
    write_checkpoint(snap, parts=3)           # multi-part at head (11)
    log_dir = os.path.join(t.path, "_delta_log")
    multi = sorted(n for n in os.listdir(log_dir)
                   if ".checkpoint." in n and n.endswith(".parquet")
                   and ".0000000003.parquet" in n)
    assert len(multi) == 3
    os.remove(os.path.join(log_dir, multi[-1]))   # tear the set
    # the stale pointer (if updated) and listing must both fall back
    t2 = DeltaTable.for_path(spark, str(tmp_path / "ck"))
    assert t2.to_df().count() == 12
    seg = t2.log.snapshot().segment
    assert seg.checkpoint_version in (None, 10)


def test_checkpoint_crash_fallbacks_on_s3_store(tmp_path):
    """Segment selection against the S3 conditional-put store (moto):
    absent pointer, and a pointer naming a TORN multi-part set, must
    both fall back to the previous complete checkpoint + full tail.
    Spark can't open s3:// parquet in this sandbox, so the pin targets
    get_log_segment itself — the component whose listing/fallback
    behavior differs per store."""
    pytest.importorskip("moto")
    import json

    import boto3
    import moto

    from connectors_spark.log import filenames as fn
    from connectors_spark.log.logstore import default_log_store
    from connectors_spark.log.segment import (get_log_segment,
                                              write_last_checkpoint)
    with moto.mock_aws():
        boto3.client("s3", region_name="us-east-1").create_bucket(
            Bucket="ckpt-bucket")
        root = "s3://ckpt-bucket/tbl"
        log = root + "/_delta_log"
        store = default_log_store(root)
        meta = json.dumps({"metaData": {
            "id": "m", "format": {"provider": "parquet", "options": {}},
            "schemaString": "{}", "partitionColumns": [],
            "configuration": {}}})
        proto = json.dumps({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}})
        for v in range(13):
            lines = [proto, meta] if v == 0 else [json.dumps(
                {"add": {"path": str(v), "partitionValues": {},
                         "size": 1, "modificationTime": 1,
                         "dataChange": True}})]
            store.write(fn.delta_file(log, v), lines)
        # complete single-part checkpoint at 10 (segment selection never
        # opens checkpoint contents — only the NAMES matter here)
        store.write(fn.checkpoint_file_single(log, 10), ["x"])
        write_last_checkpoint(store, log, 10, 12, None)
        seg = get_log_segment(store, log)
        assert seg.checkpoint_version == 10 and seg.version == 12

        # crash window 1: parts published, pointer never written
        store.delete(log + "/_last_checkpoint")
        seg = get_log_segment(store, log)
        assert seg.checkpoint_version == 10 and seg.version == 12

        # crash window 2: TORN multi-part at 12 (2 of 3 parts) with the
        # pointer already naming it — completeness must reject the set
        # and the stale-hint re-list must recover checkpoint 10
        names = fn.checkpoint_file_parts(log, 12, 3)
        for n in names[:2]:
            store.write(n, ["x"])
        write_last_checkpoint(store, log, 12, 14, 3)
        seg = get_log_segment(store, log)
        assert seg.checkpoint_version == 10 and seg.version == 12
        assert [fn.delta_version(os.path.basename(p))
                for p in seg.deltas] == [11, 12]


def test_checkpoint_from_materialized_inventory_matches_cold(spark, tmp_path):
    """r14: write_checkpoint reuses the Snapshot's materialized file
    inventory when present (skipping the double distributed replay).
    The checkpoint it writes must be row-identical to one produced by a
    cold snapshot's fully distributed plan — adds (stats/tags/row-id
    fields included), retained tombstones, and P&M/txn rows alike."""
    import glob

    from connectors_spark.expressions import Lit
    from connectors_spark.log.checkpoints import write_checkpoint

    orders = read_table(spark, "orders")
    t = DeltaTable.for_path(spark, str(tmp_path / "ckm"))
    t.write(orders.limit(500), partition_by=["o_orderstatus"],
            configuration={"delta.enableRowTracking": "true",
                           "delta.protocol.autoUpgrade": "true"})
    t.delete(Col("o_orderkey") < Lit(50))      # tombstones ride along
    v = t.log.snapshot().version
    log_dir = os.path.join(t.path, "_delta_log")

    def ckpt_rows():
        files = glob.glob(os.path.join(log_dir, "*checkpoint*.parquet"))
        return sorted(spark.read.parquet(*files).toJSON().collect())

    def clear_ckpt():
        for f in glob.glob(os.path.join(log_dir, "*checkpoint*.parquet")):
            os.remove(f)
        lc = os.path.join(log_dir, "_last_checkpoint")
        if os.path.exists(lc):
            os.remove(lc)

    snap_cold = t.log.snapshot_for_version(v)
    assert "_files_rows" not in snap_cold.__dict__
    write_checkpoint(snap_cold)
    rows_cold = ckpt_rows()
    clear_ckpt()

    snap_warm = t.log.snapshot_for_version(v)
    _ = snap_warm._files_rows                  # force materialization
    assert "_files_rows" in snap_warm.__dict__
    # the warm write must take the driver-side pyarrow fast path (not a
    # silent fallback) — record what it returns
    import connectors_spark.log.checkpoints as CK
    taken = []
    orig = CK._write_checkpoint_driver

    def spy(snap, pm):
        n = orig(snap, pm)
        taken.append(n)
        return n
    CK._write_checkpoint_driver = spy
    try:
        write_checkpoint(snap_warm)
    finally:
        CK._write_checkpoint_driver = orig
    assert taken and taken[0] is not None, taken
    rows_warm = ckpt_rows()

    assert len(rows_cold) > 2
    assert rows_warm == rows_cold
