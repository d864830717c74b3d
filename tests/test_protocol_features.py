"""Opt-in protocol upgrade (delta.protocol.autoUpgrade): tables using
extension features (column mapping, DVs, CDF, ICT, generated/identity)
bump their Protocol action to the Delta-spec versions so FOREIGN legacy
readers refuse loudly instead of silently misreading — the last
silent-wrong-answer edge flagged in VERDICT r9. Default stays (1,2)
for reference parity (actions.scala:31-35)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from connectors_spark import DeltaTable
from connectors_spark.errors import DeltaProtocolError
from connectors_spark.expressions import Col, Lit
from connectors_spark.log import features as feat
from connectors_spark.log.actions import Protocol


def _mk(spark, path, auto=True, n=40):
    t = DeltaTable.for_path(spark, path)
    conf = {"delta.protocol.autoUpgrade": "true"} if auto else {}
    t.write(spark.createDataFrame(
        [Row(k=i, status="A" if i % 2 else "B", v=i * 10)
         for i in range(n)]), partition_by=["status"],
        configuration=conf)
    return t


def test_default_stays_reference_protocol(spark, tmp_path):
    """Without the opt-in, extension features keep Protocol(1,2) —
    reference parity is the default contract."""
    t = _mk(spark, str(tmp_path / "noup"), auto=False)
    t.enable_column_mapping()
    p = t.snapshot().protocol
    assert (p.minReaderVersion, p.minWriterVersion) == (1, 2)


def test_column_mapping_upgrades_to_2_5(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "cm"))
    t.enable_column_mapping()
    p = t.snapshot().protocol
    assert (p.minReaderVersion, p.minWriterVersion) == (2, 5)
    assert p.readerFeatures is None and p.writerFeatures is None
    # the full mapped-table matrix still works under the upgraded
    # protocol: rename, DML, scan pruning, read-back
    t.rename_column("v", "val")
    t.update({"val": "val + 1"}, Col("k") == Lit(2))
    t.delete(Col("k") == Lit(3))
    assert t.to_df().filter("k = 2").first().val == 21
    assert t.to_df().filter("k = 3").count() == 0
    n = len(t.scan(Col("status") == Lit("A")).collect_files())
    assert 0 < n < len(t.snapshot().all_files())


def test_dv_upgrades_to_table_features(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "dv"))
    t.delete(Col("k") == Lit(5), deletion_vectors=True)
    p = t.snapshot().protocol
    assert (p.minReaderVersion, p.minWriterVersion) == (3, 7)
    assert "deletionVectors" in (p.readerFeatures or [])
    assert "deletionVectors" in (p.writerFeatures or [])
    # legacy writer features are enumerated too (spec rule at writer 7)
    assert {"appendOnly", "invariants"} <= set(p.writerFeatures)
    # our own reader still reads the DV'd table correctly
    assert t.to_df().filter("k = 5").count() == 0
    assert t.to_df().count() == 39


def test_upgrade_is_monotone_and_composes(spark, tmp_path):
    """CM then DV: versions only grow; the DV upgrade keeps
    columnMapping in the feature lists (a feature once required never
    disappears)."""
    t = _mk(spark, str(tmp_path / "combo"))
    t.enable_column_mapping()
    t.delete(Col("k") == Lit(7), deletion_vectors=True)
    p = t.snapshot().protocol
    assert (p.minReaderVersion, p.minWriterVersion) == (3, 7)
    assert set(p.readerFeatures) == {"columnMapping", "deletionVectors"}
    assert "columnMapping" in p.writerFeatures
    # further commits don't churn the protocol (no per-commit spam)
    v0 = t.snapshot().version
    t.write(spark.createDataFrame([Row(k=900, status="A", v=1)]),
            mode="append")
    lines = t.log.store.read(
        f"{t.log.log_path}/{t.snapshot().version:020d}.json")
    assert not any('"protocol"' in ln for ln in lines)


def test_ict_and_generated_versions(spark, tmp_path):
    t = DeltaTable.for_path(spark, str(tmp_path / "ict"))
    t.write(spark.createDataFrame([Row(k=1)]),
            configuration={"delta.protocol.autoUpgrade": "true",
                           "delta.enableInCommitTimestamps": "true"})
    p = t.snapshot().protocol
    assert (p.minReaderVersion, p.minWriterVersion) == (1, 7)
    assert p.readerFeatures is None
    assert "inCommitTimestamp" in p.writerFeatures

    t2 = DeltaTable.for_path(spark, str(tmp_path / "gen"))
    t2.write(spark.createDataFrame([Row(k=1)]),
             configuration={"delta.protocol.autoUpgrade": "true"},
             generated_columns={"k2": ("int", "k * 2")})
    p2 = t2.snapshot().protocol
    assert (p2.minReaderVersion, p2.minWriterVersion) == (1, 4)

    t3 = DeltaTable.for_path(spark, str(tmp_path / "ident"))
    t3.write(spark.createDataFrame([Row(name="a")]),
             configuration={"delta.protocol.autoUpgrade": "true"},
             identity_columns={"uid": ("bigint", 0, 1)})
    p3 = t3.snapshot().protocol
    assert (p3.minReaderVersion, p3.minWriterVersion) == (1, 6)


def test_foreign_legacy_reader_refuses_upgraded_table(spark, tmp_path,
                                                      monkeypatch):
    """THE interop-safety property: a reader honouring only the
    reference's (1,2) gate must REFUSE an upgraded mapped/DV table —
    loud failure instead of physical column names / resurrected rows.
    Simulated by pinning the support constants to the reference's."""
    t = _mk(spark, str(tmp_path / "foreign"))
    t.enable_column_mapping()
    t.delete(Col("k") == Lit(5), deletion_vectors=True)
    v = t.snapshot().version
    monkeypatch.setattr(feat, "MAX_SUPPORTED_READER_VERSION", 1)
    monkeypatch.setattr(feat, "SUPPORTED_READER_FEATURES", set())
    fresh = t.log.snapshot_for_version(v)  # uncached replay
    with pytest.raises(ValueError, match="reader protocol version"):
        fresh.metadata
    # reader-2-capable but feature-blind also refuses at reader 3
    monkeypatch.setattr(feat, "MAX_SUPPORTED_READER_VERSION", 3)
    fresh2 = t.log.snapshot_for_version(v)
    with pytest.raises(ValueError, match="reader table features"):
        fresh2.metadata


def test_unsupported_protocol_uncommittable_and_unwritable(spark, tmp_path):
    """Protocols outside the engine's feature space stay uncommittable
    (the reference's refusal, extended); a table already carrying an
    unknown writer feature refuses further commits."""
    t = _mk(spark, str(tmp_path / "unsup"), auto=False)
    txn = t.log.start_transaction()
    with pytest.raises(DeltaProtocolError, match="Protocol"):
        txn.commit([Protocol(4, 8)], "UPGRADE", {})
    txn2 = t.log.start_transaction()
    with pytest.raises(DeltaProtocolError, match="Protocol"):
        txn2.commit([Protocol(3, 7, readerFeatures=["v2Checkpoint"],
                              writerFeatures=["v2Checkpoint"])],
                    "UPGRADE", {})


def test_protocol_features_survive_checkpoint(spark, tmp_path):
    """The upgraded protocol (incl. feature lists) round-trips through
    a checkpoint + fresh replay."""
    t = _mk(spark, str(tmp_path / "ckpt"))
    t.delete(Col("k") == Lit(5), deletion_vectors=True)
    from connectors_spark.log.checkpoints import write_checkpoint
    write_checkpoint(t.snapshot())
    for _ in range(2):
        t.write(spark.createDataFrame(
            [Row(k=1000, status="A", v=0)]), mode="append")
    fresh = t.log.snapshot_for_version(t.snapshot().version)
    p = fresh.protocol
    assert (p.minReaderVersion, p.minWriterVersion) == (3, 7)
    assert "deletionVectors" in (p.readerFeatures or [])


def test_merge_protocols_unit():
    """Monotone merge semantics, incl. legacy-implied features when a
    protocol crosses into table-features encoding."""
    m = feat.merge_protocols
    # no-op on equal
    assert m(Protocol(1, 2), Protocol(1, 2)) == Protocol(1, 2)
    # legacy growth stays legacy (no feature lists below 3/7)
    p = m(Protocol(1, 2), Protocol(2, 5))
    assert p == Protocol(2, 5)
    assert p.readerFeatures is None and p.writerFeatures is None
    # crossing into writer-7 enumerates the legacy features
    p = m(Protocol(1, 6),
          Protocol(3, 7, readerFeatures=["deletionVectors"],
                   writerFeatures=["deletionVectors"]))
    assert p.minWriterVersion == 7 and p.minReaderVersion == 3
    assert {"identityColumns", "deletionVectors", "appendOnly",
            "invariants"} <= set(p.writerFeatures)
    assert p.readerFeatures == ["deletionVectors"]


def test_protocol_downgrade_refused(spark, tmp_path):
    """Protocols are monotone: committing Protocol(1,2) — or any action
    that does not dominate the snapshot's protocol — on an upgraded
    table must raise (delta-spark's ProtocolDowngradeException), never
    silently downgrade and re-expose the table to legacy readers."""
    t = _mk(spark, str(tmp_path / "down"))
    t.enable_column_mapping()           # autoUpgrade → (2, 5)
    p = t.snapshot().protocol
    assert (p.minReaderVersion, p.minWriterVersion) == (2, 5)
    txn = t.log.start_transaction()
    with pytest.raises(DeltaProtocolError, match="downgrade"):
        txn.commit([Protocol(1, 2)], "UPGRADE PROTOCOL", {})
    # the table is untouched
    p2 = t.snapshot().protocol
    assert (p2.minReaderVersion, p2.minWriterVersion) == (2, 5)
    # a dominating re-commit is still fine (no-op upgrade)
    txn = t.log.start_transaction()
    txn.commit([Protocol(2, 5)], "UPGRADE PROTOCOL", {})
    p3 = t.snapshot().protocol
    assert (p3.minReaderVersion, p3.minWriterVersion) == (2, 5)


def test_protocol_feature_subset_downgrade_refused(spark, tmp_path):
    """Equal version components but a SMALLER feature set is still a
    downgrade at writer 7 (explicit lists are authoritative)."""
    from connectors_spark.expressions import Col, Lit

    t = _mk(spark, str(tmp_path / "downf"))
    t.delete(Col("k") == Lit(5), deletion_vectors=True)  # → (3, 7) DV
    p = t.snapshot().protocol
    assert p.minWriterVersion == 7
    assert "deletionVectors" in (p.writerFeatures or [])
    txn = t.log.start_transaction()
    with pytest.raises(DeltaProtocolError):
        txn.commit([Protocol(3, 7, readerFeatures=[],
                             writerFeatures=[])],
                    "UPGRADE PROTOCOL", {})


def test_protocol_dominates_unit():
    assert feat.protocol_dominates(Protocol(2, 5), Protocol(1, 2))
    assert not feat.protocol_dominates(Protocol(1, 2), Protocol(2, 5))
    assert feat.protocol_dominates(Protocol(1, 2), Protocol(1, 2))
    # writer-7: explicit lists authoritative
    a = Protocol(3, 7, readerFeatures=["deletionVectors"],
                 writerFeatures=["deletionVectors"])
    b = Protocol(3, 7, readerFeatures=[], writerFeatures=[])
    assert feat.protocol_dominates(a, b)
    assert not feat.protocol_dominates(b, a)


def test_feature_property_enablement_and_vacuum_protocol_check(
        spark, tmp_path):
    """delta.feature.<name>=supported (delta-spark's property-keyed
    feature opt-in) activates a named feature; unknown names fail the
    commit loudly; a vacuumProtocolCheck table runs the writer gate
    before reclaiming, so a protocol demanding unknown writer features
    refuses VACUUM instead of deleting files it may not understand."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from connectors_spark.errors import DeltaError, DeltaProtocolError
    from connectors_spark.log.actions import Protocol
    from connectors_spark.table import DeltaTable, TableMaintenance

    t = DeltaTable.for_path(spark, str(tmp_path / "t"))
    t.write(spark.range(10).select(F.col("id"),
                                   (F.col("id") * 2).alias("v")),
            configuration={
                "delta.feature.vacuumProtocolCheck": "supported",
                "delta.protocol.autoUpgrade": "true"})
    p = t.log.snapshot().protocol
    assert "vacuumProtocolCheck" in (p.writerFeatures or [])
    assert "vacuumProtocolCheck" in (p.readerFeatures or [])
    # vacuum runs (the gate passes: this engine implements the feature)
    assert TableMaintenance(t).vacuum(retention_ms=10**15) == []
    # unknown feature name -> loud failure at commit time
    t2 = DeltaTable.for_path(spark, str(tmp_path / "t2"))
    with _pytest.raises((DeltaError, ValueError)):
        t2.write(spark.range(3).select(F.col("id"),
                                       (F.col("id") * 2).alias("v")),
                 configuration={"delta.feature.managedCommits":
                                "supported"})
    # foreign table demanding an unknown WRITER feature: reads refuse
    # already (assert_readable is reader-scoped and this is writer-
    # only), and VACUUM must refuse through the writer gate
    t3 = DeltaTable.for_path(spark, str(tmp_path / "t3"))
    t3.write(spark.range(5).select(F.col("id"),
                                   (F.col("id") * 2).alias("v")))
    txn = t3.log.start_transaction()
    # hand-write a protocol with an unknown writer feature (feature
    # names unknown to the engine can't go through commit -- write the
    # raw line like a foreign writer would)
    import json as _json
    from connectors_spark.log import filenames as _fn
    line = _json.dumps({"protocol": {
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": ["appendOnly", "invariants",
                           "someFutureFeature"]}})
    t3.log.store.write(_fn.delta_file(t3.log.log_path, 1),
                       [line], overwrite=False)
    t3b = DeltaTable.for_path(spark, str(tmp_path / "t3"))
    with _pytest.raises(DeltaProtocolError, match="VACUUM refused"):
        TableMaintenance(t3b).vacuum(retention_ms=10**15)


def test_ict_enablement_provenance_recorded(spark, tmp_path):
    """Enabling in-commit timestamps on a table WITH history records
    delta.inCommitTimestampEnablementVersion/-Timestamp in the SAME
    commit (the spec's cutover provenance for mixed mtime/ICT
    histories); a table created with ICT from v0 records none."""
    from pyspark.sql import functions as F

    from connectors_spark.table import DeltaTable

    t = DeltaTable.for_path(spark, str(tmp_path / "t"))
    t.write(spark.range(5).select(F.col("id"),
                                  (F.col("id") * 2).alias("v")))
    t.set_properties({"delta.enableInCommitTimestamps": "true"})
    conf = t.log.snapshot().metadata.configuration
    ever = int(conf["delta.inCommitTimestampEnablementVersion"])
    ets = int(conf["delta.inCommitTimestampEnablementTimestamp"])
    assert ever == 1
    # the recorded timestamp IS the enabling commit's own ICT
    import json as _json
    from connectors_spark.log import filenames as _fn
    line = next(iter(t.log.store.read(
        _fn.delta_file(t.log.log_path, 1))))
    assert _json.loads(line)["commitInfo"]["inCommitTimestamp"] == ets
    # created-with-ICT tables carry no provenance (never a cutover)
    t2 = DeltaTable.for_path(spark, str(tmp_path / "t2"))
    t2.write(spark.range(3).select(F.col("id"),
                                   (F.col("id") * 2).alias("v")),
             configuration={"delta.enableInCommitTimestamps": "true"})
    conf2 = t2.log.snapshot().metadata.configuration
    assert "delta.inCommitTimestampEnablementVersion" not in conf2
