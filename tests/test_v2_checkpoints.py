"""V2 (uuid-named) checkpoints — Delta protocol 'V2 Checkpoint Table
Feature': a manifest ``<v>.checkpoint.<uuid>.parquet`` carrying
P&M/txn/domainMetadata + CheckpointMetadata + SidecarFile references,
with the add/remove state in sidecar parquets under
``_delta_log/_sidecars/``. The reference implements classic
checkpoints only (Checkpoints.scala); v2 is built from the published
protocol spec.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from connectors_spark.expressions import Col, Lit
from connectors_spark.log import filenames as fn
from connectors_spark.log.checkpoints import write_checkpoint
from connectors_spark.table import DeltaTable

CFG = {"delta.checkpointPolicy": "v2",
       "delta.protocol.autoUpgrade": "true"}


def _mk(spark, path, extra_cfg=None):
    t = DeltaTable.for_path(spark, str(path))
    cfg = dict(CFG, **(extra_cfg or {}))
    t.write(spark.range(100).select(F.col("id"),
                                    (F.col("id") % 7).alias("k")),
            configuration=cfg)
    t.write(spark.range(100, 150).select(
        F.col("id"), (F.col("id") % 7).alias("k")), mode="append",
        txn_app_id="app-x", txn_version=3)
    t.delete(Col("id") < Lit(10))
    return t


def test_v2_roundtrip_state_equality(spark, tmp_path):
    """A fresh log instance reading ONLY manifest+sidecars (plus the
    empty tail) reconstructs the exact pre-checkpoint state: files,
    protocol, metadata, SetTransactions, tombstones."""
    t = _mk(spark, tmp_path / "t")
    before = t.log.snapshot()
    files_before = {(r["path"], r["size"])
                    for r in before.files_df.collect()}
    write_checkpoint(before)
    log_dir = str(tmp_path / "t" / "_delta_log")
    assert any(fn.is_v2_checkpoint_file(n) for n in os.listdir(log_dir))
    assert os.listdir(os.path.join(log_dir, fn.SIDECAR_DIR))
    t2 = DeltaTable.for_path(spark, str(tmp_path / "t"))
    snap = t2.log.snapshot()
    assert snap.segment.checkpoint_version == before.version
    assert {(r["path"], r["size"])
            for r in snap.files_df.collect()} == files_before
    assert snap.protocol == before.protocol
    assert snap.metadata.schemaString == before.metadata.schemaString
    assert snap.txn_version("app-x") == 3
    assert snap.to_df().count() == 140
    # tombstones rode along (the delete's removes within retention)
    assert snap.tombstones_df.count() > 0
    # reader feature pinned on the protocol
    assert "v2Checkpoint" in (snap.protocol.readerFeatures or [])


def test_v2_multi_sidecar_and_tail(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    write_checkpoint(t.log.snapshot(), parts=3)
    log_dir = str(tmp_path / "t" / "_delta_log")
    side = os.listdir(os.path.join(log_dir, fn.SIDECAR_DIR))
    assert len(side) == 3
    t.write(spark.range(150, 170).select(
        F.col("id"), (F.col("id") % 7).alias("k")), mode="append")
    t2 = DeltaTable.for_path(spark, str(tmp_path / "t"))
    assert t2.to_df().count() == 160
    assert sorted(r.id for r in t2.to_df().collect()) \
        == list(range(10, 170))


def test_v2_preferred_over_classic_at_same_version(spark, tmp_path):
    """CheckpointInstance ordering: when both a classic and a v2
    checkpoint exist at one version, readers pick the v2 manifest
    (and among racing v2 manifests, deterministically the greatest)."""
    t = _mk(spark, tmp_path / "t")
    snap = t.log.snapshot()
    write_checkpoint(snap)                   # v2 (table policy)
    # hand-write a CLASSIC checkpoint at the same version by flipping
    # the policy on a twin metadata — simplest: call the classic writer
    # via a doctored snapshot config
    import dataclasses
    meta = dataclasses.replace(
        snap.metadata,
        configuration=dict(snap.metadata.configuration,
                           **{"delta.checkpointPolicy": "classic"}))
    snap._pm = (snap.protocol, meta)
    write_checkpoint(snap)
    log_dir = str(tmp_path / "t" / "_delta_log")
    names = os.listdir(log_dir)
    assert any(fn.is_v2_checkpoint_file(n) for n in names)
    assert any(n == "%020d.checkpoint.parquet" % snap.version
               for n in names)
    t2 = DeltaTable.for_path(spark, str(tmp_path / "t"))
    seg = t2.log.snapshot().segment
    assert len(seg.checkpoint_files) == 1
    assert fn.is_v2_checkpoint_file(seg.checkpoint_files[0])
    assert t2.to_df().count() == 140


def test_v2_manifest_checkpoint_metadata_row(spark, tmp_path):
    import pyarrow.parquet as pq
    t = _mk(spark, tmp_path / "t")
    write_checkpoint(t.log.snapshot())
    log_dir = str(tmp_path / "t" / "_delta_log")
    manifest = next(os.path.join(log_dir, n) for n in os.listdir(log_dir)
                    if fn.is_v2_checkpoint_file(n))
    rows = pq.read_table(manifest).to_pylist()
    cms = [r["checkpointMetadata"] for r in rows
           if r.get("checkpointMetadata")
           and r["checkpointMetadata"].get("version") is not None]
    assert len(cms) == 1 and cms[0]["version"] == 2
    sides = [r["sidecar"] for r in rows
             if r.get("sidecar") and r["sidecar"].get("path")]
    assert sides and all(s["sizeInBytes"] > 0 for s in sides)
    # NO add/remove rows in the manifest — state is sidecar-only
    assert not any(r.get("add") and r["add"].get("path") for r in rows)
    assert not any(r.get("remove") and r["remove"].get("path")
                   for r in rows)


def test_v2_sidecar_cleanup_keeps_referenced(spark, tmp_path):
    """Expired-log cleanup retires sidecars only when NO retained
    manifest references them; the live checkpoint's sidecars survive
    even at zero retention."""
    path = str(tmp_path / "t")
    t = DeltaTable.for_path(spark, path)
    cfg = dict(CFG, **{"delta.checkpointInterval": "2",
                       "delta.logRetentionDuration":
                       "interval 0 seconds"})
    for i in range(6):   # checkpoints at v2 and v4 (interval 2)
        t.write(spark.range(i * 10, (i + 1) * 10).toDF("id")
                .coalesce(1), mode="append", configuration=cfg)
    log_dir = os.path.join(path, "_delta_log")
    side_dir = os.path.join(log_dir, fn.SIDECAR_DIR)
    import pyarrow.parquet as pq
    live_manifests = [n for n in os.listdir(log_dir)
                      if fn.is_v2_checkpoint_file(n)]
    assert live_manifests
    referenced = set()
    for n in live_manifests:
        for row in pq.read_table(os.path.join(log_dir, n),
                                 columns=["sidecar"]).to_pylist():
            sc = row.get("sidecar")
            if sc and sc.get("path"):
                referenced.add(sc["path"])
    on_disk = set(os.listdir(side_dir))
    # every surviving sidecar is referenced by a retained manifest...
    assert on_disk == referenced
    # ...and the table reads completely
    t2 = DeltaTable.for_path(spark, path)
    assert t2.to_df().count() == 60


def test_v2_checkpoint_with_row_tracking_domains(spark, tmp_path):
    """Domain metadata and baseRowIds survive through the MANIFEST +
    sidecar split (domains in the manifest, adds in sidecars)."""
    t = _mk(spark, tmp_path / "t",
            extra_cfg={"delta.enableRowTracking": "true"})
    rid_before = {r["id"]: r["_row_id"]
                  for r in t.to_df(with_row_ids=True).collect()}
    write_checkpoint(t.log.snapshot())
    t2 = DeltaTable.for_path(spark, str(tmp_path / "t"))
    dm = t2.log.snapshot().domain_metadata["delta.rowTracking"]
    # >= 149: the initial 150 rows, plus the rewrite-delete's fresh
    # baseRowId range for its new files (whose rows' MATERIALIZED ids
    # still preserve identity — checked below)
    assert json.loads(dm)["rowIdHighWaterMark"] >= 149
    rid_after = {r["id"]: r["_row_id"]
                 for r in t2.to_df(with_row_ids=True).collect()}
    assert rid_after == rid_before


def test_foreign_v2_manifest_shapes(spark, tmp_path):
    """Foreign-writer v2 shapes parse: a DASHED-uuid manifest name, a
    manifest with checkpointMetadata tags, and sidecar rows written by
    another engine (extra unknown columns) — the reader must not
    depend on this engine's own writer quirks."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from connectors_spark.log.actions import (SINGLE_ACTION_SCHEMA,
                                              to_json_line)
    t = DeltaTable.for_path(spark, str(tmp_path / "t"))
    t.write(spark.range(20).select(F.col("id"),
                                   (F.col("id") % 3).alias("k"))
            .coalesce(1), configuration=CFG)
    snap = t.log.snapshot()
    log_dir = str(tmp_path / "t" / "_delta_log")
    # hand-write the sidecar: add rows only, via Spark so the nested
    # struct matches SINGLE_ACTION_SCHEMA, then move it in place
    from connectors_spark.log.snapshot import addfiles_from_rows
    adds = addfiles_from_rows(snap.files_df.collect())
    side_name = "foreign-sidecar-0001.parquet"
    side_dir = os.path.join(log_dir, fn.SIDECAR_DIR)
    os.makedirs(side_dir, exist_ok=True)
    lines = [to_json_line(a) for a in adds]
    sdf = spark.read.json(
        spark.sparkContext.parallelize(lines, 1),
        schema=SINGLE_ACTION_SCHEMA).coalesce(1)
    tmp_out = str(tmp_path / "side_tmp")
    sdf.write.mode("overwrite").parquet(tmp_out)
    import shutil as _sh
    part = next(f for f in sorted(os.listdir(tmp_out))
                if f.endswith(".parquet"))
    _sh.copy(os.path.join(tmp_out, part),
             os.path.join(side_dir, side_name))
    # manifest with a DASHED uuid name + tags on checkpointMetadata
    from connectors_spark.log.actions import (CheckpointMetadata,
                                              SidecarFile)
    mlines = [to_json_line(snap.protocol),
              to_json_line(snap.metadata),
              to_json_line(CheckpointMetadata(
                  snap.version, tags={"engine": "other"})),
              to_json_line(SidecarFile(side_name, 123, 456))]
    mdf = spark.read.json(
        spark.sparkContext.parallelize(mlines, 1),
        schema=SINGLE_ACTION_SCHEMA).coalesce(1)
    tmp_out2 = str(tmp_path / "man_tmp")
    mdf.write.mode("overwrite").parquet(tmp_out2)
    part2 = next(f for f in sorted(os.listdir(tmp_out2))
                 if f.endswith(".parquet"))
    dashed = str(_uuid.uuid4())          # 36 chars with dashes
    _sh.copy(os.path.join(tmp_out2, part2),
             os.path.join(log_dir,
                          "%020d.checkpoint.%s.parquet"
                          % (snap.version, dashed)))
    assert fn.is_v2_checkpoint_file(
        "%020d.checkpoint.%s.parquet" % (snap.version, dashed))
    t2 = DeltaTable.for_path(spark, str(tmp_path / "t"))
    seg = t2.log.snapshot().segment
    assert seg.checkpoint_version == snap.version
    assert t2.to_df().count() == 20


def test_streaming_snapshot_reads_v2_checkpoint(spark, tmp_path):
    """ST4 initial snapshot over a v2-checkpointed table: the planner
    must resolve the manifest's sidecars (the manifest itself carries
    NO add rows — without resolution the stream would silently plan
    zero files)."""
    from connectors_spark.streaming import register_stream_source
    register_stream_source(spark)
    t = _mk(spark, tmp_path / "t")          # 140 live rows
    write_checkpoint(t.log.snapshot())
    name = "v2st_" + os.path.basename(str(tmp_path)).replace("-", "_")
    q = (spark.readStream.format("delta_stream")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.table(name).count() == 140
