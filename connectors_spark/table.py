"""DeltaLog + DeltaTable: the engine's user-facing API.

Read lifecycle (SURVEY §3.1): ``DeltaTable.for_path(spark, path)`` →
driver-side LogSegment listing → snapshot (distributed state
reconstruction) → ``scan(pred)`` → ``to_df()`` → Catalyst/Tungsten.

Write lifecycle (§3.2): ``write()``/``delete()``/``update()``/``merge()``
stage Parquet distributed, then commit through the optimistic transaction
protocol.

Reference entry points re-expressed: DeltaLog.forTable
(``DeltaLog.java:163-177``, ``DeltaLogImpl.scala:256-264``), update
(``SnapshotManagement.update:45-99``), time travel
(``SnapshotManagement.scala:51-59``), getChanges
(``DeltaLogImpl.scala:106-130``), startTransaction
(``DeltaLogImpl.scala:174-177``).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import threading
import urllib.parse
import uuid
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import TableConfig
from .errors import DeltaError, DeltaProtocolError
from .expressions import Expression
from .log import filenames as fn
from .log.actions import (AddFile, CommitInfo, Metadata, Protocol, RemoveFile,
                          SetTransaction, from_json_line)
from .log.logstore import LogStore, default_log_store, strip_scheme
from .log.segment import LogSegment, get_log_segment
from .log.snapshot import Snapshot, canonical_path
from .log import history as hist
from .scan import DeltaScan
from .txn import OptimisticTransaction
from .writer import (CHANGE_TYPE_COL, stage_and_collect,
                     stage_cdc_and_collect)

_log_cache: Dict[str, "DeltaLog"] = {}
_log_cache_lock = threading.Lock()


# Materialization budget for DML intermediate relations (r15, VERDICT
# r14 #5): localCheckpoint of the matched/hit relation is the r14
# single-scan optimization, but it stores O(matched rows) on executor
# local disk — a whole-table MERGE/UPDATE at 100 TB would checkpoint
# roughly the table. Above this row bound the DML keeps the LAZY plan
# instead (each consumer re-derives the join/filter — the pre-r14
# distributed shape: more scans, no materialized state). Row-
# denominated because the bound comes from file stats numRecords and
# source counts. Env-overridable for deployments.
_DML_MATERIALIZE_MAX_ROWS = int(os.environ.get(
    "CONNECTORS_SPARK_DML_MATERIALIZE_MAX_ROWS", 10_000_000))


def _stats_numrecords_bound(files) -> Optional[int]:
    """Driver-side upper row bound for a set of files from their stats
    JSON (numRecords); None when any file lacks stats — unknown must
    read as UNBOUNDED, never zero, or the guard would happily
    materialize a whole stats-less table. Accepts inventory rows or
    AddFile actions (both expose ``.stats``)."""
    total = 0
    for f in files:
        st = f.stats if hasattr(f, "stats") else f["stats"]
        if not st:
            return None
        try:
            n = json.loads(st).get("numRecords")
        except ValueError:
            return None
        if n is None:
            return None
        total += int(n)
    return total


def _canonical_table_path(table_path: str) -> str:
    """file:/local → absolute POSIX path; any other scheme stays a URI
    (its registered LogStore owns path semantics)."""
    if "://" in table_path and not table_path.startswith("file:"):
        return table_path.rstrip("/")
    return strip_scheme(os.path.abspath(strip_scheme(table_path))).rstrip("/")


class DeltaLog:
    """One per table path per process (module-level cache, ≍ the reference's
    Guava caches: DeltaHelper.scala:117-136)."""

    def __init__(self, spark: SparkSession, table_path: str):
        self.spark = spark
        # file:/local paths normalize to absolute POSIX form; other
        # schemes (memory://, s3://...) keep their URI verbatim — their
        # LogStore owns path semantics.
        self.table_path = _canonical_table_path(table_path)
        self.log_path = os.path.join(self.table_path, "_delta_log")
        self.store: LogStore = default_log_store(self.table_path)
        self._snapshot: Optional[Snapshot] = None
        self._lock = threading.RLock()  # deltaLogLock (DeltaLogImpl.scala:190)

    # ----------------------------------------------------------- factory

    @classmethod
    def for_table(cls, spark: SparkSession, table_path: str) -> "DeltaLog":
        key = _canonical_table_path(table_path)
        with _log_cache_lock:
            log = _log_cache.get(key)
            if log is None or log.spark is not spark:
                log = cls(spark, table_path)
                _log_cache[key] = log
            return log

    # ------------------------------------------------------------- state

    def table_exists(self) -> bool:
        try:
            get_log_segment(self.store, self.log_path)
            return True
        except (FileNotFoundError, ValueError):
            return False

    def update(self) -> Optional[Snapshot]:
        """Recompute the latest snapshot; no-op when the segment is unchanged
        (SnapshotManagement.update:65-99)."""
        with self._lock:
            try:
                seg = get_log_segment(self.store, self.log_path)
            except FileNotFoundError:
                self._snapshot = None
                return None
            cur = self._snapshot
            if cur is not None and cur.segment == seg:
                return cur
            new = Snapshot(self.spark, self.table_path, seg, self.store)
            # Incremental state update (r14, delta-spark's incremental
            # InMemoryLogReplay): when the previous snapshot already
            # materialized its inventory and the new segment merely
            # extends it by tail commits on the same checkpoint, seed
            # the new inventory by applying the tail's add/remove
            # actions driver-side — O(tail), no Spark job, and at
            # large scale no re-read of a million-file checkpoint per
            # commit. Any surprise (missing delta file, parse error)
            # falls back to the full distributed replay.
            # The seed is valid across a checkpoint boundary too (r14):
            # the materialized state at cur.version plus the raw delta
            # files (cur.version, seg.version] IS the state at
            # seg.version no matter which checkpoint the new segment
            # prefers — commits are immutable once written, and a
            # missing/cleaned delta file surfaces as FileNotFoundError
            # in tail() and falls back to the full replay.
            if cur is not None and seg.version == cur.segment.version:
                # Same version, different segment composition (a new
                # checkpoint or compaction appeared): the STATE is
                # identical by definition, so the materialized planes
                # carry over as-is instead of going cold.
                for k in ("_files_rows", "_tombstone_rows"):
                    if k in cur.__dict__:
                        new.__dict__[k] = cur.__dict__[k]
            if (cur is not None
                    and ("_files_rows" in cur.__dict__
                         or "_tombstone_rows" in cur.__dict__)
                    and seg.version > cur.segment.version):
                try:
                    from .log.actions import from_json_line
                    from .log.snapshot import (
                        apply_tail_to_files_rows,
                        apply_tail_to_tombstone_rows)

                    def tail():
                        for v in range(cur.segment.version + 1,
                                       seg.version + 1):
                            lines = self.store.read(
                                fn.delta_file(self.log_path, v))
                            yield v, [a for a in
                                      (from_json_line(ln)
                                       for ln in lines)
                                      if a is not None]

                    tail_actions = list(tail())
                    if "_files_rows" in cur.__dict__:
                        new.__dict__["_files_rows"] = \
                            apply_tail_to_files_rows(
                                cur._files_rows, tail_actions,
                                self.table_path)
                    # tombstone plane seeds the same way (r14): a
                    # checkpoint write or vacuum that materialized the
                    # tombstones keeps them warm across commits
                    if "_tombstone_rows" in cur.__dict__:
                        new.__dict__["_tombstone_rows"] = \
                            apply_tail_to_tombstone_rows(
                                cur._tombstone_rows, tail_actions,
                                self.table_path)
                except Exception:  # noqa: BLE001 — seed is best-effort
                    new.__dict__.pop("_files_rows", None)
                    new.__dict__.pop("_tombstone_rows", None)
            self._snapshot = new
            return self._snapshot

    def snapshot(self) -> Snapshot:
        s = self.update()
        if s is None:
            raise FileNotFoundError(f"{self.table_path} is not a Delta table")
        return s

    # -------------------------------------------------------- time travel

    def snapshot_for_version(self, version: int) -> Snapshot:
        """T1 (SnapshotManagement.scala:51-54): exact version, bounded by
        [earliest reproducible, latest]."""
        seg = get_log_segment(self.store, self.log_path, version_to_load=version)
        return Snapshot(self.spark, self.table_path, seg, self.store)

    def snapshot_for_timestamp(self, ts_ms: int) -> Snapshot:
        """T2 (SnapshotManagement.scala:56-59): latest commit whose
        monotonized timestamp <= ts."""
        commits = hist.list_commits(self.store, self.log_path)
        c = hist.active_commit_at_time(commits, ts_ms)
        return self.snapshot_for_version(c.version)

    def version_before_or_at_timestamp(self, ts_ms: int) -> int:
        """T3 (DeltaLogImpl.scala:132-146)."""
        commits = hist.list_commits(self.store, self.log_path)
        c = hist.active_commit_at_time(commits, ts_ms, can_return_last=True)
        return c.version

    def version_at_or_after_timestamp(self, ts_ms: int) -> int:
        """T3 (DeltaLogImpl.scala:148-172)."""
        commits = hist.list_commits(self.store, self.log_path)
        c = hist.active_commit_at_time(commits, ts_ms, can_return_last=True,
                                       can_return_earliest=True)
        if c.timestamp >= ts_ms:
            return c.version
        if c.version + 1 <= commits[-1].version:
            return c.version + 1
        raise ValueError(f"no version at or after timestamp {ts_ms}")

    # ----------------------------------------------------------- history

    def history(self) -> List[Dict[str, Any]]:
        commits = hist.list_commits(self.store, self.log_path)
        out = []
        for c in reversed(commits):
            info = hist.commit_info_at(self.store, self.log_path, c.version)
            out.append({"version": c.version, "timestamp": c.timestamp,
                        "operation": info.operation,
                        "operationParameters": info.operationParameters,
                        "operationMetrics": info.operationMetrics,
                        "isBlindAppend": info.isBlindAppend,
                        "isolationLevel": info.isolationLevel,
                        "readVersion": info.readVersion,
                        "userId": info.userId,
                        "userName": info.userName,
                        "userMetadata": info.userMetadata,
                        "engineInfo": info.engineInfo,
                        "inCommitTimestamp": info.inCommitTimestamp})
        return out

    def commit_info_at(self, version: int) -> CommitInfo:
        return hist.commit_info_at(self.store, self.log_path, version)

    # ----------------------------------------------------------- changes

    def get_changes(self, start_version: int = 0,
                    fail_on_data_loss: bool = False
                    ) -> Iterator[Tuple[int, List[Any]]]:
        """ST1/T5 (DeltaLogImpl.getChanges, DeltaLogImpl.scala:106-130):
        iterator of (version, actions) with gap detection."""
        names = [n for n in self.store.list_from(
            self.log_path, "%020d" % start_version) if fn.is_delta_file(n)]
        versions = sorted(fn.delta_version(n) for n in names)
        if fail_on_data_loss and versions and versions[0] != start_version:
            raise DeltaError(
                f"versions [{start_version}, {versions[0]}) were cleaned up "
                f"(failOnDataLoss)")
        last = None
        for v in versions:
            if fail_on_data_loss and last is not None and v != last + 1:
                raise DeltaError(f"version gap between {last} and {v}")
            last = v
            lines = self.store.read(fn.delta_file(self.log_path, v))
            yield v, [a for a in (from_json_line(l) for l in lines)
                      if a is not None]

    # ------------------------------------------------------ transactions

    def start_transaction(self) -> OptimisticTransaction:
        return OptimisticTransaction(self)

    def post_commit(self, version: int) -> None:
        """W7/W8 (OptimisticTransactionImpl.postCommit:393-405): checkpoint
        every ``checkpointInterval`` commits, then expired-log cleanup."""
        snap = self.update()
        if snap is None:
            return
        cfg = TableConfig(snap.metadata.configuration)
        if version % cfg.checkpoint_interval == 0 and version > 0:
            from .log.checkpoints import write_checkpoint
            ckpt_snap = snap if snap.version == version \
                else self.snapshot_for_version(version)
            write_checkpoint(ckpt_snap)
            if cfg.enable_expired_log_cleanup:
                self._cleanup_expired_logs(version, cfg)
        elif cfg.auto_compact_log and version > 0:
            # Opt-in minor-log auto-compaction (the checkpoint branch
            # above resets the tail, so the two never fire together):
            # when the RAW delta tail past the last compacted range (or
            # checkpoint) reaches minCommits, net-fold exactly that
            # fixed-width window — adjacent ranges keep the steady-state
            # commit cost O(N) every N commits (amortized O(1)), and
            # replay reads checkpoint + a few compacted files + <N raw
            # deltas. Best-effort: same no-op-on-race contract as
            # compact_log; a failure never fails the commit.
            try:
                self._maybe_auto_compact_log(snap, cfg)
            except Exception:  # noqa: BLE001 — advisory maintenance
                pass

    def _maybe_auto_compact_log(self, snap, cfg: TableConfig) -> None:
        from .log import filenames as fn
        seg = snap.segment
        raw_start = None
        n_raw = 0
        for p in seg.deltas:
            name = os.path.basename(p)
            if fn.is_compacted_file(name):
                raw_start, n_raw = None, 0
            else:
                v = fn.delta_version(name)
                if raw_start is None:
                    raw_start = v
                n_raw += 1
        if raw_start is not None \
                and n_raw >= cfg.auto_compact_log_min_commits:
            _compact_log_range(self, self.table_path, raw_start,
                               seg.version)

    def _cleanup_expired_logs(self, checkpoint_version: int,
                              cfg: TableConfig) -> None:
        """W8 (MetadataCleanup.scala:50-97, simplified): delete delta files
        older than logRetention that precede the new checkpoint. Expiry uses
        monotonized timestamps so a lagging mtime can't orphan a younger
        commit (BufferingLogDeletionIterator.scala:30-60)."""
        cutoff = int(time.time() * 1000) - cfg.log_retention_ms
        commits = hist.list_commits(self.store, self.log_path)
        expired = set()
        for c in commits:
            if c.version >= checkpoint_version or c.timestamp >= cutoff:
                break
            expired.add(c.version)
            self.store.delete(fn.delta_file(self.log_path, c.version))
            # the version's advisory checksum record expires with it
            from .log import checksum as cks
            try:
                self.store.delete(
                    cks.checksum_file(self.log_path, c.version))
            except FileNotFoundError:
                pass
        if not expired:
            return
        # Superseded checkpoint files for expired versions go too
        # (MetadataCleanup deletes delta AND checkpoint files before the
        # cutoff; the just-written checkpoint is never expired).
        for name in self.store.list_from(self.log_path):
            if fn.is_checkpoint_file(name) \
                    and fn.checkpoint_version(name) in expired:
                self.store.delete(os.path.join(self.log_path, name))
            elif fn.is_compacted_file(name):
                s, e = fn.compacted_range(name)
                # a compacted file is dead once its END expires (it can
                # only substitute in the post-checkpoint tail, and its
                # end is now below the checkpoint); checking the end
                # alone also converges when the range's versions expire
                # across DIFFERENT cleanup runs — requiring s too would
                # orphan the file forever once s's delta was deleted in
                # an earlier run
                if e in expired or (e < checkpoint_version and
                                    not self.store.exists(
                                        fn.delta_file(self.log_path, e))):
                    self.store.delete(os.path.join(self.log_path, name))
        # V2 sidecars are only reachable through a manifest: once every
        # manifest referencing one is gone, the sidecar is garbage.
        # Delete sidecar files older than the cutoff that no RETAINED
        # manifest references (never an age-only delete — a live
        # old checkpoint keeps its sidecars alive indefinitely).
        side_dir = os.path.join(self.log_path, fn.SIDECAR_DIR)
        side_names = [s for s in self.store.list_dir(side_dir)
                      if s.endswith(".parquet")]
        if side_names:
            import pyarrow.parquet as pq
            referenced = set()
            for name in self.store.list_from(self.log_path):
                if not fn.is_v2_checkpoint_file(name):
                    continue
                mpath = os.path.join(self.log_path, name)
                try:
                    if "sidecar" not in pq.read_schema(mpath).names:
                        continue
                    for row in pq.read_table(
                            mpath, columns=["sidecar"]).to_pylist():
                        sc = row.get("sidecar")
                        if sc and sc.get("path"):
                            referenced.add(sc["path"])
                except Exception:  # noqa: BLE001 — keep on parse issues
                    return  # unreadable manifest: keep every sidecar
            for s in side_names:
                p = os.path.join(side_dir, s)
                if s not in referenced \
                        and self.store.mtime_ms(p) < cutoff:
                    self.store.delete(p)


class DeltaTable:
    """High-level table handle: reads, time travel, writes, DML, changes."""

    def __init__(self, log: DeltaLog):
        self.log = log
        self.spark = log.spark

    # ----------------------------------------------------------- factory

    @classmethod
    def for_path(cls, spark: SparkSession, path: str) -> "DeltaTable":
        return cls(DeltaLog.for_table(spark, path))

    @property
    def path(self) -> str:
        return self.log.table_path

    # ------------------------------------------------------------- reads

    def snapshot(self) -> Snapshot:
        return self.log.snapshot()

    def to_df(self, version: Optional[int] = None,
              timestamp_ms: Optional[int] = None,
              with_row_ids: bool = False) -> DataFrame:
        """Table rows; ``with_row_ids=True`` (row-tracked tables only)
        appends ``_row_id`` / ``_row_commit_version`` — stable under
        appends and DV deletes; rewrites (OPTIMIZE) materialize them
        into the written files so they survive the rewrite too."""
        snap = self._resolve(version, timestamp_ms)
        if with_row_ids:
            from .config import TableConfig
            if not TableConfig(
                    snap.metadata.configuration).enable_row_tracking:
                raise DeltaError(
                    "row ids requested but delta.enableRowTracking is "
                    "not set on this table")
        return snap.to_df(with_row_ids=with_row_ids)

    def scan(self, predicate: Optional[Expression] = None,
             version: Optional[int] = None) -> DeltaScan:
        snap = self._resolve(version, None)
        return DeltaScan(snap, predicate)

    def _resolve(self, version: Optional[int],
                 timestamp_ms: Optional[int]) -> Snapshot:
        if version is not None and timestamp_ms is not None:
            raise DeltaError("versionAsOf and timestampAsOf are mutually exclusive")
        if version is not None:
            return self.log.snapshot_for_version(version)
        if timestamp_ms is not None:
            return self.log.snapshot_for_timestamp(timestamp_ms)
        return self.log.snapshot()

    def history(self) -> List[Dict[str, Any]]:
        return self.log.history()

    def metadata_aggregates(self, cols: Sequence[str] = (),
                            version: Optional[int] = None) -> DataFrame:
        """COUNT(*) (and MIN/MAX of ``cols``) answered from AddFile
        statistics alone — the metadata-only aggregate optimization
        (delta-spark's OptimizeMetadataOnlyDeltaQuery): the plan reads
        the log's stats JSON, never a data Parquet. Sound because the
        writer records EXACT per-file footer stats (writer.py:57-92,
        not truncated), MIN/MAX ignore per-file all-null columns the
        same way SQL MIN/MAX ignore null rows, and the fast path is
        refused — falling back to a real scan — when any active file
        lacks stats or carries a deletion vector (a DV removes rows
        from data but not from stats, so both the count and an
        extremal row could be stale).

        Returns one row: (n_rows, min_<c>, max_<c>...). At 100 TB this
        is a metadata-sized job over the file inventory; the validity
        probe is one tiny aggregate over the same relation."""
        from .dv import DV_TAG
        snap = self._resolve(version, None)
        files = snap.files_local_df
        nrec = F.get_json_object(F.col("stats"), "$.numRecords") \
            .cast("long")
        dtypes = {f.name: f.dataType
                  for f in snap.metadata.data_schema.fields}
        ptypes = {f.name: f.dataType
                  for f in snap.metadata.partition_schema.fields}
        # stats JSON / partitionValues keys are PHYSICAL names
        phys = snap.metadata.name_map()
        for c in cols:
            if c not in dtypes and c not in ptypes:
                raise DeltaError(f"no such column: {c}")
        invalid_cond = (nrec.isNull() |
                        F.col("tags").getItem(DV_TAG).isNotNull())
        for c in cols:
            if c in ptypes:
                continue
            # A file may legitimately lack a min/max entry for a column
            # only when the column is all-null in that file (nullCount
            # == numRecords) — then MIN/MAX skip it like SQL skips null
            # rows. Count-only stats (foreign writers) or omitted
            # min/max (binary/decimal, writer.py) would make the fast
            # path silently wrong, so they force the real scan.
            pc = phys.get(c, c)
            ncnt = F.get_json_object(F.col("stats"),
                                     f"$.nullCount.{pc}").cast("long")
            has = (F.get_json_object(
                       F.col("stats"), f"$.minValues.{pc}").isNotNull() &
                   F.get_json_object(
                       F.col("stats"), f"$.maxValues.{pc}").isNotNull())
            all_null = ncnt.isNotNull() & (ncnt == nrec)
            invalid_cond = invalid_cond | (~has & ~all_null)
        invalid = files.filter(invalid_cond).limit(1).count()
        if invalid:
            # Fall back to the real scan — still one aggregate, just
            # over data rows instead of file stats.
            df = snap.to_df()
            aggs = [F.count(F.lit(1)).alias("n_rows")]
            for c in cols:
                aggs += [F.min(c).alias(f"min_{c}"),
                         F.max(c).alias(f"max_{c}")]
            return df.agg(*aggs)
        aggs = [F.coalesce(F.sum(nrec), F.lit(0)).cast("long")
                .alias("n_rows")]
        for c in cols:
            pc = phys.get(c, c)
            if c in ptypes:
                # Partition columns live in partitionValues, not the
                # stats JSON — every row of a file shares the value, so
                # min == max == the decoded partition value.
                v = F.col("partitionValues")[pc].cast(ptypes[c])
                lo = hi = v
            else:
                lo = F.get_json_object(F.col("stats"),
                                       f"$.minValues.{pc}").cast(dtypes[c])
                hi = F.get_json_object(F.col("stats"),
                                       f"$.maxValues.{pc}").cast(dtypes[c])
            aggs += [F.min(lo).alias(f"min_{c}"),
                     F.max(hi).alias(f"max_{c}")]
        return files.agg(*aggs)

    def show_partitions(self,
                        version: Optional[int] = None) -> DataFrame:
        """SHOW PARTITIONS: the distinct partition tuples of the
        snapshot's ACTIVE files, decoded to the partition schema's
        types — answered from the file inventory alone (no data
        Parquet opened). Raises on an unpartitioned table, matching
        delta-spark."""
        snap = self._resolve(version, None)
        pcols = snap.metadata.partitionColumns
        if not pcols:
            raise DeltaError("SHOW PARTITIONS on an unpartitioned table")
        ptypes = {f.name: f.dataType
                  for f in snap.metadata.partition_schema.fields}
        phys = snap.metadata.name_map()
        return (snap.files_local_df
                .select(*[F.col("partitionValues")
                          .getItem(phys.get(c, c))
                          .cast(ptypes[c]).alias(c) for c in pcols])
                .distinct())

    def describe_detail(self) -> Dict[str, Any]:
        """DESCRIBE DETAIL: one metadata-plane row about the table —
        format, id, createdAt, lastModified, partitionColumns,
        numFiles, sizeInBytes, properties, protocol versions (the
        delta-spark `DESCRIBE DETAIL` surface). numFiles/sizeInBytes
        come from one aggregate over the file inventory; no data
        Parquet is opened."""
        snap = self.snapshot()
        summary = snap.state_summary()
        hist = self.log.history()
        return {
            "format": "delta",
            "id": snap.metadata.id,
            "location": self.path,
            "createdAt": snap.metadata.createdTime,
            "lastModified": hist[0]["timestamp"] if hist else None,
            "partitionColumns": list(snap.metadata.partitionColumns),
            "numFiles": int(summary["numOfFiles"]),
            "sizeInBytes": int(summary["sizeInBytes"]),
            "properties": dict(snap.metadata.configuration or {}),
            "minReaderVersion": snap.protocol.minReaderVersion,
            "minWriterVersion": snap.protocol.minWriterVersion,
        }

    def set_properties(self, props: Dict[str, str]) -> int:
        """ALTER TABLE SET TBLPROPERTIES: merge ``props`` into the
        table configuration via a metadata-only commit (reference op
        name ``Operation.java`` SET TABLE PROPERTIES; config registry
        semantics DeltaConfig.scala:199-253). Enforcement picks up the
        new values immediately — e.g. ``delta.appendOnly=true`` blocks
        the next delete/update/overwrite."""
        import dataclasses

        from .errors import ConcurrentModificationException
        if "delta.columnMapping.mode" in props:
            raise DeltaError("use enable_column_mapping(); the mode "
                             "cannot be set directly")
        # Fresh-snapshot retry: a property commit re-derives everything
        # it writes (merged configuration, and — when flipping
        # delta.enableRowTracking — the enablement backfill's re-add
        # list) from the snapshot, so losing a race is resolved by
        # recomputing on the new head, never by replaying stale actions.
        last: Optional[Exception] = None
        for _ in range(10):
            txn = self.log.start_transaction()
            snap = txn.snapshot
            if snap is None:
                raise FileNotFoundError("table does not exist")
            conf = dict(snap.metadata.configuration or {})
            conf.update(props)
            txn.update_metadata(dataclasses.replace(
                snap.metadata, configuration=conf))
            try:
                return txn.commit([], "SET TBLPROPERTIES",
                                  {"properties": json.dumps(dict(props))})
            except ConcurrentModificationException as e:
                last = e
        raise last

    # ------------------------------------------- column mapping (name mode)

    _CM_ID = "delta.columnMapping.id"
    _CM_PHYS = "delta.columnMapping.physicalName"
    _CM_MODE = "delta.columnMapping.mode"
    _CM_MAXID = "delta.columnMapping.maxColumnId"

    def enable_column_mapping(self) -> int:
        """Upgrade the table to column mapping mode ``name``: every
        schema field gets a stable id and a physical name — for
        EXISTING columns the physical name equals the current logical
        name (the delta-spark upgrade rule), so every already-written
        file stays readable with zero rewrite. After this,
        rename_column / drop_column are metadata-only commits.

        Composes with the change data feed: CDC files are written in
        the physical name domain like data files, and the CDF reader
        aliases back to the CURRENT logical names (changes spanning a
        rename surface under the new name).

        Protocol-fidelity note: the Delta spec gates column mapping
        behind minReaderVersion>=2 / minWriterVersion>=5. By DEFAULT
        this engine keeps its tables at the reference's protocol
        (1, 2) because the reference reader IS the compatibility
        target (SURVEY W9). Setting the table property
        ``delta.protocol.autoUpgrade=true`` (log/features.py) makes
        every commit bump the Protocol action to the spec versions the
        table state requires — CM → (2,5), DVs → (3,7) table features,
        ICT → writer feature — so a FOREIGN legacy reader refuses the
        table loudly instead of surfacing physical column names or
        resurrecting DV-deleted rows."""
        import dataclasses
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        meta = snap.metadata
        if meta.column_mapping_mode == "name":
            return snap.version
        fields = []
        for i, f in enumerate(meta.schema.fields):
            md = dict(f.metadata or {})
            md[self._CM_ID] = i + 1
            md[self._CM_PHYS] = f.name
            fields.append(T.StructField(f.name, f.dataType,
                                        f.nullable, md))
        conf = dict(meta.configuration or {})
        conf[self._CM_MODE] = "name"
        conf[self._CM_MAXID] = str(len(fields))
        txn.update_metadata(dataclasses.replace(
            meta,
            schemaString=json.dumps(T.StructType(fields).jsonValue()),
            configuration=conf))
        return txn.commit([], "ALTER TABLE",
                          {"columnMapping": "name"})

    def _require_mapping(self, meta):
        if meta.column_mapping_mode != "name":
            raise DeltaError("requires column mapping: run "
                             "enable_column_mapping() first")

    def rename_column(self, old: str, new: str) -> int:
        """RENAME COLUMN — metadata-only under column mapping: the
        field keeps its id and physical name, so no data file is
        touched and time travel still shows the old logical name at
        old versions."""
        import dataclasses
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        meta = snap.metadata
        self._require_mapping(meta)
        names = {f.name for f in meta.schema.fields}
        if old not in names:
            raise DeltaError(f"no such column: {old!r}")
        if new in names:
            raise DeltaError(f"column already exists: {new!r}")
        for key, expr in (meta.configuration or {}).items():
            if key.startswith("delta.constraints.") and old in expr:
                raise DeltaError(
                    f"column {old!r} is referenced by constraint "
                    f"{key!r}; drop the constraint first")
        import re as _re
        for f in meta.schema.fields:
            gen = (f.metadata or {}).get(_GEN_KEY)
            if gen and f.name != old and _re.search(
                    rf"\b{_re.escape(old)}\b", gen):
                raise DeltaError(
                    f"column {old!r} is referenced by generated "
                    f"column {f.name!r} (GENERATED ALWAYS AS {gen})")
        fields = [T.StructField(new if f.name == old else f.name,
                                f.dataType, f.nullable, f.metadata)
                  for f in meta.schema.fields]
        conf = self._rename_in_config(meta.configuration, old, new)
        txn.update_metadata(dataclasses.replace(
            meta,
            schemaString=json.dumps(T.StructType(fields).jsonValue()),
            partitionColumns=[new if c == old else c
                              for c in meta.partitionColumns],
            configuration=conf))
        return txn.commit([], "RENAME COLUMN",
                          {"oldName": old, "newName": new})

    def drop_column(self, name: str) -> int:
        """DROP COLUMN — metadata-only under column mapping: the data
        stays in the files (time travel still reads it); current-
        version scans simply never project it. The id is never reused,
        so re-adding the same logical name later cannot resurrect old
        values."""
        import dataclasses
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        meta = snap.metadata
        self._require_mapping(meta)
        if name in meta.partitionColumns:
            raise DeltaError(f"cannot drop partition column {name!r}")
        names = {f.name for f in meta.schema.fields}
        if name not in names:
            raise DeltaError(f"no such column: {name!r}")
        if len(names) == 1:
            raise DeltaError("cannot drop the last column")
        for key, expr in (meta.configuration or {}).items():
            if key.startswith("delta.constraints.") and name in expr:
                raise DeltaError(
                    f"column {name!r} is referenced by constraint "
                    f"{key!r}; drop the constraint first")
        import re as _re
        for f in meta.schema.fields:
            gen = (f.metadata or {}).get(_GEN_KEY)
            if gen and f.name != name and _re.search(
                    rf"\b{_re.escape(name)}\b", gen):
                raise DeltaError(
                    f"column {name!r} is referenced by generated "
                    f"column {f.name!r} (GENERATED ALWAYS AS {gen})")
        fields = [f for f in meta.schema.fields if f.name != name]
        conf = self._rename_in_config(meta.configuration, name, None)
        txn.update_metadata(dataclasses.replace(
            meta,
            schemaString=json.dumps(T.StructType(fields).jsonValue()),
            configuration=conf))
        return txn.commit([], "DROP COLUMNS", {"column": name})

    def add_column(self, name: str, dtype, nullable: bool = True) -> int:
        """ADD COLUMN under column mapping: a fresh id and physical
        name (``col-<id>``) that no existing file contains — existing
        rows read NULL, only future writes materialize it."""
        import dataclasses
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        meta = snap.metadata
        self._require_mapping(meta)
        if name in {f.name for f in meta.schema.fields}:
            raise DeltaError(f"column already exists: {name!r}")
        if isinstance(dtype, str):
            dtype = _parse_dtype(dtype)
        conf = dict(meta.configuration or {})
        next_id = int(conf.get(self._CM_MAXID, "0")) + 1
        conf[self._CM_MAXID] = str(next_id)
        # The upgrade rule keeps existing columns' physical names equal
        # to their logical names, so a pre-existing column literally
        # named "col-<n>" can collide with the generated name — two
        # fields with one physical name would corrupt every read. Fall
        # back to a UUID-based physical name (delta-spark's scheme) on
        # collision.
        phys = f"col-{next_id}"
        taken = {(f.metadata or {}).get(self._CM_PHYS)
                 for f in meta.schema.fields}
        if phys in taken:
            phys = f"col-{uuid.uuid4()}"
        md = {self._CM_ID: next_id, self._CM_PHYS: phys}
        fields = list(meta.schema.fields) + [
            T.StructField(name, dtype, nullable, md)]
        txn.update_metadata(dataclasses.replace(
            meta,
            schemaString=json.dumps(T.StructType(fields).jsonValue()),
            configuration=conf))
        return txn.commit([], "ADD COLUMNS", {"column": name})

    def alter_column_type(self, name: str, new_type) -> int:
        """ALTER COLUMN TYPE — type widening (Delta protocol 'Type
        Widening'): metadata-only promotion to a wider type (byte <
        short < int < long, float -> double, decimal precision growth
        at equal scale). No data file is touched — old files keep the
        narrow physical type and the parquet reader promotes at scan
        time; the change is recorded in the field's
        ``delta.typeChanges`` metadata so foreign readers know mixed
        physical types are expected. Requires
        ``delta.enableTypeWidening``."""
        import dataclasses

        from .txn import is_type_widening
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        meta = snap.metadata
        if not TableConfig(meta.configuration).enable_type_widening:
            raise DeltaError(
                "type widening requires delta.enableTypeWidening=true")
        field = next((f for f in meta.schema.fields if f.name == name),
                     None)
        if field is None:
            raise DeltaError(f"no such column: {name!r}")
        if isinstance(new_type, str):
            new_type = _parse_dtype(new_type)
        if not is_type_widening(field.dataType, new_type):
            raise DeltaError(
                f"cannot change {name!r} from "
                f"{field.dataType.simpleString()} to "
                f"{new_type.simpleString()}: only widening conversions "
                f"(byte<short<int<long, float->double, decimal "
                f"precision growth at equal scale) are supported")
        if name in (meta.partitionColumns or []):
            # partition values are log STRINGS decoded by schema type;
            # widening them is representationally fine but delta-spark
            # refuses, and stats/pruning parity matters more than the
            # convenience — refuse loudly.
            raise DeltaError(
                f"cannot widen partition column {name!r}")
        import re as _re
        for f in meta.schema.fields:
            gen = (f.metadata or {}).get(_GEN_KEY)
            if gen and _re.search(rf"\b{_re.escape(name)}\b", gen):
                raise DeltaError(
                    f"column {name!r} is referenced by generated "
                    f"column {f.name!r}; widening could change the "
                    f"generated values")
        md = dict(field.metadata or {})
        changes = list(md.get("delta.typeChanges") or [])
        changes.append({"fromType": field.dataType.simpleString(),
                        "toType": new_type.simpleString()})
        md["delta.typeChanges"] = changes
        fields = [T.StructField(f.name, new_type if f.name == name
                                else f.dataType, f.nullable,
                                md if f.name == name else f.metadata)
                  for f in meta.schema.fields]
        txn.update_metadata(dataclasses.replace(
            meta,
            schemaString=json.dumps(T.StructType(fields).jsonValue())))
        return txn.commit([], "CHANGE COLUMN",
                          {"column": name,
                           "toType": new_type.simpleString()})

    @staticmethod
    def _rename_in_config(configuration, old: str, new: Optional[str]):
        """Track a logical rename/drop in config values that list
        logical column names (the bloom skipping column list)."""
        from .bloom import BLOOM_COLUMNS_KEY
        conf = dict(configuration or {})
        if BLOOM_COLUMNS_KEY in conf:
            cols = [c.strip() for c in
                    conf[BLOOM_COLUMNS_KEY].split(",") if c.strip()]
            cols = [new if c == old else c for c in cols]
            conf[BLOOM_COLUMNS_KEY] = ",".join(
                c for c in cols if c is not None)
        return conf

    # ------------------------------------------------------------ writes

    def _make_metadata(self, df: DataFrame, partition_by: Sequence[str],
                       configuration: Optional[Dict[str, str]] = None,
                       existing: Optional[Metadata] = None) -> Metadata:
        schema = df.schema
        if existing is not None:
            # Write-time schema evolution must not strip field metadata:
            # df.schema carries none, so a naive schemaString=df.schema
            # would silently drop delta.generationExpression and
            # delta.identity.* from pre-existing columns — after one
            # evolving append the generated-column invariant would stop
            # being enforced and identity allocation would reset. Carry
            # metadata over by name from the pre-evolution schema
            # (which the caller passes as txn.new_metadata when an
            # identity high-water-mark bump is already staged).
            keep = {f.name: f.metadata for f in existing.schema.fields
                    if f.metadata}
            # nullability merges as OR: evolution may relax a column
            # to nullable but an INFERRED non-null batch schema must
            # never silently tighten the table's contract (tightening
            # is the explicit set_nullable ALTER)
            was_nullable = {f.name: f.nullable
                            for f in existing.schema.fields}
            schema = T.StructType([
                T.StructField(f.name, f.dataType,
                              f.nullable or was_nullable.get(f.name,
                                                             f.nullable),
                              keep.get(f.name, f.metadata))
                for f in schema.fields])
        return Metadata(
            id=existing.id if existing else str(uuid.uuid4()),
            schemaString=json.dumps(schema.jsonValue()),
            partitionColumns=list(partition_by),
            configuration=dict(configuration or
                               (existing.configuration if existing else {})),
            createdTime=existing.createdTime if existing
            else int(time.time() * 1000))

    def write(self, df: DataFrame, mode: str = "append",
              partition_by: Optional[Sequence[str]] = None,
              configuration: Optional[Dict[str, str]] = None,
              replace_where: Optional[Expression] = None,
              txn_app_id: Optional[str] = None,
              txn_version: Optional[int] = None,
              generated_columns: Optional[Dict[str, Tuple[str, str]]]
              = None,
              identity_columns: Optional[Dict[str, Tuple[str, int, int]]]
              = None,
              user_metadata: Optional[str] = None) -> int:
        """Append/overwrite ``df``. Creates the table on first write.

        ``replace_where`` (overwrite only): atomically replace EXACTLY
        the rows matching the predicate with ``df`` — the Delta
        replaceWhere contract. Every incoming row must satisfy the
        predicate (raises otherwise, matching Delta's constraint
        check); existing files are dropped whole when the predicate
        fully covers them (partition/stats-pruned, no data read) and
        rewritten keep-rows-only when it only partially covers them.
        One transaction: readers never see a state with the old rows
        gone and the new ones missing.

        ``txn_app_id``/``txn_version`` (set together): IDEMPOTENT
        write — the delta-spark txnAppId/txnVersion option pair over
        the reference's SetTransaction watermark (actions.scala:88-94,
        txnVersion OptimisticTransactionImpl.scala:221-224). The
        commit records SetTransaction(app_id, version); a write whose
        version is ≤ the table's recorded watermark for that app is
        SKIPPED (returns -1), so a retried job can never double-append.
        The conflict checker already fails concurrent commits touching
        the same appId, making the check-then-commit race-safe."""
        if mode not in ("append", "overwrite"):
            raise DeltaError(f"unsupported write mode {mode!r}")
        if replace_where is not None and mode != "overwrite":
            raise DeltaError("replace_where requires mode='overwrite'")
        if (txn_app_id is None) != (txn_version is None):
            raise DeltaError(
                "txn_app_id and txn_version must be set together")
        if replace_where is not None:
            if txn_app_id is not None:
                raise DeltaError(
                    "idempotent writes are not supported with "
                    "replace_where")
            return self._replace_where(df, replace_where, configuration)
        txn = self.log.start_transaction()
        exists = txn.snapshot is not None and txn.read_version >= 0
        if generated_columns is not None or identity_columns is not None:
            # GENERATED ALWAYS AS [IDENTITY] is a create-time property
            # (delta-spark: DeltaTable.create builder only)
            if exists:
                raise DeltaError("generated_columns/identity_columns "
                                 "can only be set when the table is "
                                 "created")
            for name, (ddl, expr) in (generated_columns or {}).items():
                dtype = _parse_dtype(ddl)
                df = df.withColumn(name, F.expr(expr).cast(dtype))
        elif exists:
            df = _fill_and_check_generated(
                df, txn.snapshot.metadata, "written")
            df = _apply_identity(txn, df, txn.snapshot.metadata)
        if txn_app_id is not None and exists \
                and txn.txn_version(txn_app_id) >= txn_version:
            return -1
        if exists:
            meta = txn.snapshot.metadata
            pcols = list(partition_by) if partition_by is not None \
                else list(meta.partitionColumns)
            if set(df.schema.fieldNames()) != {f.name for f in meta.schema.fields}:
                if meta.column_mapping_mode != "none":
                    raise DeltaError(
                        "write-time schema evolution is not supported "
                        "under column mapping — use add_column / "
                        "rename_column / drop_column")
                # Base the merge on txn.new_metadata when set:
                # _apply_identity above may have staged an advanced
                # identity high-water mark that a rebuild from the
                # snapshot metadata would discard. Refining the staged
                # update keeps the ≤1-Metadata-action-per-commit rule —
                # the two stagings collapse into one action.
                new_meta = self._make_metadata(
                    df, pcols, configuration, txn.new_metadata or meta)
                txn.new_metadata = None
                txn.update_metadata(new_meta)
        else:
            pcols = list(partition_by or [])
            id_hwms: Dict[str, int] = {}
            if identity_columns:
                for name, spec in identity_columns.items():
                    ddl, start, step = spec
                    if name in df.columns:
                        raise DeltaError(
                            f"column {name!r} is GENERATED ALWAYS AS "
                            f"IDENTITY and cannot be written to")
                    if step == 0:
                        raise DeltaError("identity step must be nonzero")
                    df, hwm = _allocate_identity(
                        df, name, _parse_dtype(ddl), step, start - step)
                    id_hwms[name] = hwm
            new_meta = self._make_metadata(df, pcols, configuration)
            if identity_columns:
                fields = []
                for f in new_meta.schema.fields:
                    if f.name in identity_columns:
                        _ddl, start, step = identity_columns[f.name]
                        md = dict(f.metadata or {})
                        md[_ID_START] = start
                        md[_ID_STEP] = step
                        md[_ID_HWM] = id_hwms[f.name]
                        f = T.StructField(f.name, f.dataType,
                                          f.nullable, md)
                    fields.append(f)
                import dataclasses
                new_meta = dataclasses.replace(
                    new_meta, schemaString=json.dumps(
                        T.StructType(fields).jsonValue()))
            if generated_columns:
                fields = []
                for f in new_meta.schema.fields:
                    if f.name in generated_columns:
                        md = dict(f.metadata or {})
                        md[_GEN_KEY] = generated_columns[f.name][1]
                        f = T.StructField(f.name, f.dataType,
                                          f.nullable, md)
                    fields.append(f)
                import dataclasses
                new_meta = dataclasses.replace(
                    new_meta, schemaString=json.dumps(
                        T.StructType(fields).jsonValue()))
            txn.update_metadata(new_meta)

        eff_meta = txn.new_metadata or (txn.snapshot.metadata if exists
                                        else None)
        if eff_meta is not None:
            _enforce_constraints(df, eff_meta.configuration, "written")
            _enforce_invariants(df, eff_meta, "written")

        op = "WRITE"
        adds = stage_and_collect(
            df, self.log.table_path, pcols,
            num_indexed_cols=_n_indexed(
                eff_meta.configuration if eff_meta else None),
            schema_cols=[f.name for f in eff_meta.schema.fields]
            if eff_meta is not None else None,
            bloom_cfg=_bloom(
                eff_meta.configuration if eff_meta else None),
            physical_meta=eff_meta)
        n_rows = sum(json.loads(a.stats)["numRecords"] for a in adds
                     if a.stats)
        op_params = {"mode": mode, "partitionBy": json.dumps(list(pcols))}
        op_metrics = {"numFiles": str(len(adds)),
                      "numOutputRows": str(n_rows)}
        set_txn = None
        if txn_app_id is not None:
            from .log.actions import SetTransaction
            set_txn = SetTransaction(
                appId=txn_app_id, version=int(txn_version),
                lastUpdated=int(time.time() * 1000))
        if mode == "overwrite" and exists:
            # Whole-table overwrite removes EVERY active file — an
            # O(table-width) action set, so it streams through
            # commit_stream off files_df.toLocalIterator() like
            # CLONE/RESTORE (the adds are the write's own output,
            # already O(new files) on the driver).
            txn.read_whole_table()
            now = int(time.time() * 1000)
            from .log.snapshot import addfiles_from_rows
            old_files_df = txn.snapshot.files_df

            def files_factory():
                for r in old_files_df.toLocalIterator():
                    yield addfiles_from_rows([r])[0].remove(now)
                yield from adds

            version = txn.commit_stream(
                [set_txn] if set_txn is not None else [],
                files_factory, has_removes=True, data_change=True,
                operation=op, operation_parameters=op_params,
                operation_metrics=op_metrics,
                user_metadata=user_metadata)
        else:
            actions: List[Any] = list(adds)
            if set_txn is not None:
                actions.append(set_txn)
            version = txn.commit(
                actions,
                operation=op if exists else "CREATE TABLE AS SELECT",
                operation_parameters=op_params,
                operation_metrics=op_metrics,
                user_metadata=user_metadata)
        self._maybe_auto_compact(
            (eff_meta.configuration if eff_meta else None))
        return version

    def _maybe_auto_compact(self,
                            configuration: Optional[Dict[str, str]]
                            ) -> None:
        """Post-commit small-file compaction when the
        ``delta.autoOptimize.autoCompact`` table property is on: if at
        least ``connectors.autoCompact.minNumFiles`` active files are
        below the target size, bin-pack them in a follow-up OPTIMIZE
        commit (dataChange=False — change feeds skip it). Keeps
        many-small-append workloads from accreting a file-per-commit
        layout without a scheduled OPTIMIZE job; the probe is one
        metadata-plane count, no data read.

        Best-effort by contract (delta-spark parity): the data commit
        is already durable when this runs, so ANY failure here — e.g.
        a ConcurrentDeleteReadException from two auto-compacting
        writers racing — is logged and swallowed. Propagating it would
        make the caller believe the WRITE failed, and a retry of a
        non-idempotent write would double-append."""
        conf = TableConfig(configuration or {})
        if not conf.auto_compact:
            return
        try:
            target = conf.auto_compact_target_size
            n_small = (self.snapshot().files_df
                       .where(F.col("size") < target).limit(
                           conf.auto_compact_min_files).count())
            if n_small >= conf.auto_compact_min_files:
                TableMaintenance(self).optimize(
                    target_file_size=target,
                    min_files_per_group=2)
        except Exception as exc:  # noqa: BLE001 — post-commit hook
            import logging
            logging.getLogger(__name__).warning(
                "auto-compact after committed write failed (write "
                "itself succeeded): %s", exc)

    def _replace_where(self, df: DataFrame, predicate: Expression,
                       configuration: Optional[Dict[str, str]]) -> int:
        """replaceWhere body: validate-in, predicate-scoped remove (or
        keep-rows rewrite for partially-covered files), staged adds —
        one commit."""
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError(
                "replace_where requires an existing table")
        meta = snap.metadata
        # generated columns may be omitted by the caller — compute them
        # BEFORE the field-set validation
        df = _fill_and_check_generated(df, meta, "written")
        # replaceWhere never evolves the schema: a frame whose field
        # set/types differ from table metadata would commit Parquet
        # files silently diverging from the table schema.
        want = {f.name: f.dataType for f in meta.schema.fields}
        got = {f.name: f.dataType for f in df.schema.fields}
        if want != got:
            raise DeltaError(
                "replaceWhere: incoming schema does not match table "
                f"schema (table {sorted(want)}, data {sorted(got)})")
        pred_col = predicate.to_column(F.col)
        n_bad = df.where(~F.coalesce(pred_col, F.lit(False))) \
            .limit(1).count()
        if n_bad:
            raise DeltaError(
                "replaceWhere: incoming data contains rows that do not "
                f"match the predicate {predicate}")
        _enforce_constraints(df, meta.configuration, "written")
        _enforce_invariants(df, meta, "written")
        now = int(time.time() * 1000)
        candidates = txn.mark_files_as_read(predicate)
        scan = DeltaScan(snap, predicate)
        actions: List[Any] = []
        if scan.residual is None:
            # predicate fully file-resolvable: drop candidates whole
            actions += [f.remove(now) for f in candidates]
        else:
            cand_paths = {canonical_path(f.path, snap.table_path)
                          for f in candidates}
            files_subset = [r for r in snap._files_rows
                            if r["path"] in cand_paths]
            rt = TableConfig(meta.configuration).enable_row_tracking
            old = snap.to_df(files=files_subset, with_row_ids=rt)
            hit = F.coalesce(pred_col, F.lit(False))
            keep = old.where(~hit)
            if rt:
                # KEPT rows of partially-covered files survive the
                # replace logically — materialize their ids through the
                # rewrite (replaced rows are new data and draw fresh
                # ids from the staged files' baseRowIds)
                from .log.snapshot import materialized_rt_cols
                rid_c, rcv_c = materialized_rt_cols(meta)
                keep = (keep
                        .withColumnRenamed("_row_id", rid_c)
                        .withColumnRenamed("_row_commit_version", rcv_c))
            actions += stage_and_collect(
                keep, self.log.table_path, meta.partitionColumns,
                num_indexed_cols=_n_indexed(meta.configuration),
                bloom_cfg=_bloom(meta.configuration),
                physical_meta=meta)
            actions += [f.remove(now) for f in candidates]
        actions += stage_and_collect(
            df, self.log.table_path, meta.partitionColumns,
            num_indexed_cols=_n_indexed(meta.configuration),
            bloom_cfg=_bloom(meta.configuration),
            physical_meta=meta)
        return txn.commit(
            actions, "WRITE",
            operation_parameters={"mode": "overwrite",
                                  "predicate": str(predicate)})

    # --------------------------------------------------------------- DML

    def delete(self, predicate: Optional[Expression] = None,
               deletion_vectors: bool = False) -> int:
        """DELETE: drop whole files when the predicate is partition-only,
        else rewrite only the touched files (SURVEY §7 P6; op names
        Operation.java:43-105). With ``deletion_vectors=True`` a
        row-level delete records deleted positions in a sidecar instead
        of rewriting the touched files (dv.py) — the scale path when the
        deleted rows are a small fraction of very large files."""
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        now = int(time.time() * 1000)
        if predicate is None:
            txn.read_whole_table()
            actions: List[Any] = [f.remove(now) for f in snap.all_files()]
            return txn.commit(actions, "DELETE",
                              {"predicate": "true"})
        candidates = txn.mark_files_as_read(predicate)
        scan = DeltaScan(snap, predicate)
        actions = []
        if scan.residual is not None and deletion_vectors:
            return self._delete_with_dv(txn, snap, predicate, candidates,
                                        now)
        if scan.residual is None:
            # Whole-file delete: no CDC files needed even with CDF on --
            # the change reader synthesizes delete rows from the removed
            # (still readable) Parquet, so file-granular deletes stay
            # metadata-only (streaming/cdf.py).
            actions += [f.remove(now) for f in candidates]
        else:
            cand_paths = {canonical_path(f.path, snap.table_path)
                          for f in candidates}
            files_subset = [r for r in snap._files_rows
                            if r["path"] in cand_paths]
            rt = TableConfig(
                snap.metadata.configuration).enable_row_tracking
            df = snap.to_df(files=files_subset, with_row_ids=rt)
            hit = F.coalesce(predicate.to_column(F.col), F.lit(False))
            keep = df.where(~hit)
            if rt:
                # surviving rows keep their ids through the rewrite:
                # materialize id + commit version into the new files
                from .log.snapshot import materialized_rt_cols
                rid_c, rcv_c = materialized_rt_cols(snap.metadata)
                keep = (keep
                        .withColumnRenamed("_row_id", rid_c)
                        .withColumnRenamed("_row_commit_version", rcv_c))
            cdc = None
            if TableConfig(snap.metadata.configuration) \
                    .enable_change_data_feed:
                cdc = df.where(hit).withColumn(
                    CHANGE_TYPE_COL, F.lit("delete"))
                if rt:
                    # deleted rows keep their ids in the change feed:
                    # materialize them into the CDC parquet under the
                    # per-table spec names so the CDF reader's coalesce
                    # (streaming/cdf.py) finds them — AddCDCFile rows
                    # have no baseRowId to fall back on
                    cdc = (cdc.withColumnRenamed("_row_id", rid_c)
                           .withColumnRenamed("_row_commit_version",
                                              rcv_c))
            # rewrite + change rows in ONE write job (r15, __is_cdc
            # staging split — see stage_and_collect)
            staged = stage_and_collect(
                keep, self.log.table_path,
                snap.metadata.partitionColumns,
                num_indexed_cols=_n_indexed(
                    snap.metadata.configuration),
                bloom_cfg=_bloom(snap.metadata.configuration),
                physical_meta=snap.metadata, cdc_df=cdc)
            adds, cdcs = staged if cdc is not None else (staged, [])
            actions += adds
            actions += [f.remove(now) for f in candidates]
            actions += cdcs
        return txn.commit(actions, "DELETE", {})

    def _delete_with_dv(self, txn, snap, predicate, candidates,
                        now: int) -> int:
        """Row-level delete via deletion vectors: the touched files stay
        physically untouched; their deleted positions (old DV ∪ new
        hits) land in one new sidecar and each file is re-added with its
        tag repointed. I/O is bounded by the deleted rows (sidecar +
        optional CDC), never by the file sizes being deleted from."""
        import dataclasses

        from .dv import DV_CARD_TAG, DV_TAG, apply_dv, dv_relation, stage_dv
        from .log.snapshot import canonical_path_col
        params = {"deletionVectors": "true"}
        if not candidates:
            return txn.commit([], "DELETE", params)
        meta = snap.metadata
        cand = {canonical_path(f.path, snap.table_path): f
                for f in candidates}
        paths = sorted(cand)
        pvs = [dict(cand[p].partitionValues or {}) for p in paths]
        rt = TableConfig(meta.configuration).enable_row_tracking
        rid_extra: List[str] = []
        read_schema = meta.physical_data_schema
        if rt:
            # carry materialized row ids through the scan so the CDC
            # pre-images below can record which rows died
            from .log.snapshot import _with_rt_fields, materialized_rt_cols
            rid_c, rcv_c = materialized_rt_cols(meta)
            read_schema = _with_rt_fields(read_schema, rid_c, rcv_c)
            rid_extra = [rid_c, rcv_c]
        # files (and partitionValues) live in the PHYSICAL name domain;
        # alias back to logical right after assembly so the predicate
        # and CDC projection below work on table names
        data = (self.spark.read.schema(read_schema)
                .parquet(*paths)
                .withColumn("__fn", F.col("_metadata.file_path"))
                .withColumn("__ri", F.col("_metadata.row_index")))
        data = data.withColumn(
            "__file",
            canonical_path_col("__fn", snap.table_path)).drop("__fn")
        if meta.partitionColumns:
            data = snap._attach_partition_values(data, paths, pvs,
                                                 keep_file=True)
        nmap = meta.name_map()
        data = data.select(
            *[F.col(nmap[f.name]).alias(f.name)
              for f in meta.schema.fields], "__file", "__ri", *rid_extra)
        prior_pairs = [(p, (f.tags or {})[DV_TAG]) for p, f in cand.items()
                       if (f.tags or {}).get(DV_TAG)]
        prior = dv_relation(self.spark, snap.table_path, prior_pairs)
        live = apply_dv(data, prior)
        hit = F.coalesce(predicate.to_column(F.col), F.lit(False))
        # Materialized once: reused for the sidecar write, the touched-
        # file counts, and the CDC pre-images.
        hits = live.where(hit).localCheckpoint(eager=True)
        touched = {r["__file"] for r in
                   hits.select("__file").distinct().collect()}
        if not touched:
            return txn.commit([], "DELETE", params)
        new_dv = hits.select(F.col("__file").alias("file_path"),
                             F.col("__ri").alias("row_index"))
        if prior is not None:
            new_dv = new_dv.unionByName(
                _semi_by_paths(prior, sorted(touched), col="file_path"))
        rel, counts = stage_dv(self.spark, snap.table_path, new_dv)
        actions: List[Any] = []
        for p in sorted(touched):
            f = cand[p]
            actions.append(f.remove(now))
            # A DV that covers every physical row means the file is
            # fully dead: drop it outright instead of re-adding a
            # zero-live-row file (delta-spark removes fully-deleted
            # files during DV deletes; keeping them would leave ghost
            # partitions in SHOW PARTITIONS and dead entries in every
            # later scan's DV anti-join).
            n_phys = None
            if f.stats:
                try:
                    n_phys = json.loads(f.stats).get("numRecords")
                except (ValueError, TypeError):
                    n_phys = None
            if n_phys is not None and counts.get(p, 0) >= n_phys:
                continue
            tags = dict(f.tags or {})
            tags[DV_TAG] = rel
            tags[DV_CARD_TAG] = str(counts.get(p, 0))
            actions.append(dataclasses.replace(
                f, tags=tags, dataChange=True))
        n_deleted = hits.count()
        if TableConfig(meta.configuration).enable_change_data_feed:
            cdc = hits
            if rt:
                # resolve each dying row's id exactly as a reader would
                # have: materialized column, else the file's baseRowId +
                # physical row index (the file itself is untouched by a
                # DV delete, so both are still authoritative)
                from .localrel import local_rows_df
                bmap = local_rows_df(
                    self.spark,
                    [(p, cand[p].baseRowId,
                      cand[p].defaultRowCommitVersion) for p in paths],
                    "__file string, __b long, __d long")
                cdc = (cdc.join(F.broadcast(bmap), "__file", "left")
                       .withColumn(rid_c, F.coalesce(
                           F.col(rid_c), F.col("__b") + F.col("__ri")))
                       .withColumn(rcv_c, F.coalesce(
                           F.col(rcv_c), F.col("__d")))
                       .drop("__b", "__d"))
            cdc = (cdc.drop("__file", "__ri")
                   .select(*[F.col(fd.name) for fd in meta.schema.fields],
                           *rid_extra)
                   .withColumn(CHANGE_TYPE_COL, F.lit("delete")))
            actions += stage_cdc_and_collect(cdc, self.log.table_path,
                                             physical_meta=snap.metadata)
        return txn.commit(
            actions, "DELETE", params,
            operation_metrics={"numDeletedRows": str(n_deleted),
                               "numDeletionVectorsAdded":
                               str(len(touched))})

    def update(self, set_exprs: Dict[str, Any],
               predicate: Optional[Expression] = None) -> int:
        """UPDATE: rewrite files containing matching rows."""
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        bad_id = set(set_exprs) & set(_identity_cols(snap.metadata))
        if bad_id:
            raise DeltaError(
                f"columns {sorted(bad_id)} are GENERATED ALWAYS AS "
                f"IDENTITY and cannot be updated")
        candidates = txn.mark_files_as_read(predicate)
        if not candidates:
            return txn.commit([], "UPDATE", {})
        cand_paths = {canonical_path(f.path, snap.table_path)
                      for f in candidates}
        files_subset = [r for r in snap._files_rows
                        if r["path"] in cand_paths]
        rt = TableConfig(snap.metadata.configuration).enable_row_tracking
        df = snap.to_df(files=files_subset, with_row_ids=rt)
        cond = predicate.to_column(F.col) if predicate is not None else F.lit(True)
        cond = F.coalesce(cond, F.lit(False))
        # Mark matched rows ONCE against pre-update values: set_exprs may
        # rewrite columns the predicate reads, so re-evaluating cond after
        # the rewrite would mis-tag rows (and lose CDF postimages).
        marked = df.withColumn("__hit", cond)
        tcols = [f.name for f in snap.metadata.schema.fields]
        cdf_on = TableConfig(
            snap.metadata.configuration).enable_change_data_feed
        if cdf_on:
            # Carry pre-update values alongside through the rewrite
            # pipeline so BOTH CDC images later derive from ONE
            # materialized hit relation (r14, same single-scan shape
            # as merge) instead of each re-scanning the candidate
            # files.
            marked = marked.select(
                "*", *[F.col(c).alias(f"__pre_{c}") for c in tcols])
        out = marked
        for col, expr in set_exprs.items():
            val = expr if not isinstance(expr, str) else F.expr(expr)
            out = out.withColumn(
                col, F.when(F.col("__hit"), val).otherwise(F.col(col)))
        # Recompute generated columns the SET list doesn't assign:
        # updating a generated column's source must refresh the
        # generated value (delta-spark recomputes in this path rather
        # than failing the stale value against the expression).
        # Explicitly-assigned generated columns still get validated by
        # _fill_and_check_generated below.
        for g, (gdt, gexpr) in _generated_exprs(snap.metadata).items():
            if g not in set_exprs:
                out = out.withColumn(
                    g, F.when(F.col("__hit"),
                              F.expr(gexpr).cast(gdt))
                    .otherwise(F.col(g)))
        _enforce_constraints(out.where("__hit").drop("__hit"),
                             snap.metadata.configuration, "updated")
        _enforce_invariants(out.where("__hit").drop("__hit"),
                            snap.metadata, "updated")
        _fill_and_check_generated(out.where("__hit").drop("__hit"),
                                  snap.metadata, "updated")
        pre_names = [f"__pre_{c}" for c in tcols] if cdf_on else []
        staged = out.drop("__hit", *pre_names)
        if rt:
            # Updated rows KEEP their row id; their materialized commit
            # version is NULLed so the reader falls back to the new
            # file's defaultRowCommitVersion (= this UPDATE's commit) —
            # exactly the spec's fresh/materialized split. Untouched
            # rows in the rewritten file keep both.
            from .log.snapshot import materialized_rt_cols
            rid_c, rcv_c = materialized_rt_cols(snap.metadata)
            staged = (out.withColumn(rid_c, F.col("_row_id"))
                .withColumn(
                    rcv_c,
                    F.when(F.col("__hit"),
                           F.lit(None).cast("long"))
                    .otherwise(F.col("_row_commit_version")))
                .drop("__hit", "_row_id", "_row_commit_version",
                      *pre_names))
        cdc = None
        if cdf_on:
            # ONE scan for both CDC images (r14): the hit rows — with
            # pre values riding alongside post values — are
            # materialized once; the pre/post projections read the
            # small checkpointed relation instead of each re-scanning
            # the candidate files. GUARDED (r15, VERDICT r14 #5): a
            # non-selective UPDATE would checkpoint O(table) rows onto
            # executor local disk — when the candidate files' stats
            # bound the hit volume above the materialization threshold,
            # keep the lazy plan (the distributed derivation re-scans
            # the candidates per image; correct at any scale).
            hits = out.where("__hit")
            bound = _stats_numrecords_bound(files_subset)
            if bound is not None and bound <= _DML_MATERIALIZE_MAX_ROWS:
                hits = hits.localCheckpoint(eager=True)
            pre = hits.select(
                *[F.col(f"__pre_{c}").alias(c) for c in tcols],
                *([F.col("_row_id"), F.col("_row_commit_version")]
                  if rt else []))
            post = hits.select(
                *tcols,
                *([F.col("_row_id"), F.col("_row_commit_version")]
                  if rt else []))
            if rt:
                # Both images carry the row's id in the CDC parquet
                # (the CDF join key row tracking exists for). The
                # preimage keeps its commit version; the postimage's is
                # this commit, unknown pre-commit — written NULL, the
                # reader falls back to _commit_version.
                pre = (pre.withColumnRenamed("_row_id", rid_c)
                       .withColumnRenamed("_row_commit_version", rcv_c))
                post = (post.withColumnRenamed("_row_id", rid_c)
                        .drop("_row_commit_version")
                        .withColumn(rcv_c, F.lit(None).cast("long")))
            pre = pre.withColumn(CHANGE_TYPE_COL, F.lit("update_preimage"))
            post = post.withColumn(CHANGE_TYPE_COL,
                                   F.lit("update_postimage"))
            cdc = pre.unionByName(post)
        # rewrite + change rows in ONE write job (r15, __is_cdc staging
        # split — see stage_and_collect)
        staged_out = stage_and_collect(
            staged, self.log.table_path,
            snap.metadata.partitionColumns,
            num_indexed_cols=_n_indexed(snap.metadata.configuration),
            bloom_cfg=_bloom(snap.metadata.configuration),
            physical_meta=snap.metadata, cdc_df=cdc)
        adds, cdcs = staged_out if cdc is not None else (staged_out, [])
        now = int(time.time() * 1000)
        actions: List[Any] = list(adds) + [f.remove(now) for f in candidates]
        actions += cdcs
        return txn.commit(actions, "UPDATE", {})

    def merge(self, source: DataFrame, condition,
              when_matched_update: Optional[Dict[str, Any]] = None,
              when_matched_delete: bool = False,
              when_not_matched_insert: bool = True,
              predicate=None) -> int:
        """MERGE (upsert): find touched files with a semi-join, rewrite only
        those, insert unmatched source rows. ``condition`` is a SQL string
        over ``t`` (target) and ``s`` (source) aliases.

        ``predicate`` (optional, an ``expressions.Expression`` over
        partition columns) narrows the merge's CONFLICT FOOTPRINT: the
        target scan is pruned to matching files and the txn records the
        predicate via ``mark_files_as_read`` instead of
        ``read_whole_table`` (OptimisticTransactionImpl.scala:162-172),
        so merges over disjoint partitions commit concurrently. The
        caller must ensure the merge condition implies the predicate
        (the standard Delta partition-scoped-merge contract) — target
        rows outside it are invisible to this merge."""
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        if predicate is None:
            txn.read_whole_table()
            scoped_files = None         # whole table
        else:
            # The scoping contract is partition-level: a data-column
            # predicate can't prune files by partitionValues, and its
            # J2 conflict evaluation would be three-valued-unknown on
            # every concurrent add. Reject it here with a clear error
            # rather than silently degrading the conflict footprint.
            part_cols = set(snap.metadata.partitionColumns)
            extra = predicate.references() - part_cols
            if extra:
                raise ValueError(
                    f"merge predicate may only reference partition columns "
                    f"{sorted(part_cols)}; got non-partition column(s) "
                    f"{sorted(extra)}")
            from .scan import DeltaScan
            txn.mark_files_as_read(predicate)
            scoped_files = DeltaScan(snap, predicate).files()
        target = snap.to_df(files=scoped_files).alias("t")
        # Materialize the source once: it is referenced by three plans
        # (touched-file discovery, matched join, insert anti-join) and a
        # nondeterministic source (limit/sample/rand) would otherwise give
        # each a different view -- the classic merge-source hazard.
        source = source.localCheckpoint(eager=True)
        src = source.alias("s")
        cond = F.expr(condition) if isinstance(condition, str) else condition

        meta = snap.metadata
        # __file comes from to_df itself (_metadata.file_path inside
        # each single-source scan): input_file_name() on the returned
        # plan is illegal once a DV anti-join makes it multi-source —
        # a merge on a DV-carrying table would fail analysis
        from .log.snapshot import addfiles_from_rows
        rt = TableConfig(meta.configuration).enable_row_tracking
        tcols = [f.name for f in meta.schema.fields]
        gens = _generated_exprs(meta)

        # ONE full scan answers BOTH merge questions — which files are
        # touched AND what the matched (target, source) row pairs are.
        # (r14, guide §1.2/§2.4: the previous shape ran the inner join
        # against the target FOUR times — touched-file discovery, the
        # rewrite's matched leg, and the two CDC images — plus the
        # kept-rows anti-join, five target scans per MERGE.) The join
        # output is projected to collision-free names, matched-update
        # expressions are evaluated HERE while t/s alias resolution is
        # still alive (aliases do not survive a checkpoint), and the
        # result is materialized: it is O(matched rows), the small
        # relation of the merge by construction. Everything downstream
        # (pre/post images, rewrite values, touched paths) derives from
        # it without rescanning the target.
        with_all = snap.to_df(files=scoped_files, with_file_col=True,
                              with_row_ids=rt)
        joined = with_all.alias("t").join(src, cond, "inner")

        def _set(v):
            # SQL strings or Columns, same contract as update()'s
            # set_exprs — str(Column) is NOT valid SQL, so Columns must
            # pass through unstringified
            return F.expr(v) if isinstance(v, str) else v

        proj = [F.col(f"t.{c}").alias(f"__t_{c}") for c in tcols]
        if when_matched_update is not None:
            bad_id = set(when_matched_update) & set(_identity_cols(meta))
            if bad_id:
                raise DeltaError(
                    f"columns {sorted(bad_id)} are GENERATED ALWAYS AS "
                    f"IDENTITY and cannot be updated")
            proj += [_set(when_matched_update[c]).alias(f"__u_{c}")
                     for c in when_matched_update if c in set(tcols)]
        proj.append(F.col("__file"))
        if rt:
            proj += [F.col("t._row_id").alias("__rid"),
                     F.col("t._row_commit_version").alias("__rcv")]
        matched_m = joined.select(*proj)
        # GUARD (r15, VERDICT r14 #5): the matched-pair checkpoint is
        # O(matched rows) on executor local disk — fine for the
        # selective-merge contract, catastrophic for a whole-table
        # match at 100 TB. Estimate matched volume driver-side: the
        # scoped target's stats numRecords bound it outright when
        # small; otherwise one count of the already-checkpointed
        # source (matched ≈ source rows under the usual key-equi
        # condition; a pathological many-to-many fanout can exceed the
        # estimate — the budget is a heuristic guard, not a hard cap).
        # Over budget, the lazy plan re-derives the join per consumer
        # (touched-path collect + rewrite legs) — the distributed
        # shape, more scans but no materialized state.
        # scoped_files is a (driver-local) DataFrame plan, not rows —
        # partition-scoped merges skip the stats bound and go straight
        # to the source count.
        tgt_bound = (_stats_numrecords_bound(snap._files_rows)
                     if scoped_files is None else None)
        est = tgt_bound if (tgt_bound is not None
                            and tgt_bound <= _DML_MATERIALIZE_MAX_ROWS) \
            else source.count()
        if est <= _DML_MATERIALIZE_MAX_ROWS:
            matched_m = matched_m.localCheckpoint(eager=True)

        # Touched files: the distinct __file set of the materialized
        # matched relation (no second discovery scan), intersected with
        # the Snapshot's materialized inventory DRIVER-side — no isin
        # literal in any plan, no log-replay job. The touched subset is
        # inherently driver-bound: it becomes the commit's RemoveFile
        # list.
        touched_paths = {r["__file"] for r in
                         matched_m.select("__file").distinct().collect()}
        touched_rows = [r for r in snap._files_rows
                        if r["path"] in touched_paths]
        touched_adds = addfiles_from_rows(touched_rows)
        touched_df = snap.to_df(files=touched_rows,
                                with_row_ids=rt).alias("t")

        if rt:
            # Row tracking through the rewrite: kept rows materialize
            # id + commit version; UPDATED rows keep their id but fall
            # back to the new file's defaultRowCommitVersion (NULL
            # materialized value); INSERTED rows get fresh ids from the
            # new file's baseRowId + row_index (NULL for both).
            from .log.snapshot import materialized_rt_cols
            rid_c, rcv_c = materialized_rt_cols(meta)
            rid_keep = [
                F.col("t._row_id").alias(rid_c),
                F.col("t._row_commit_version").alias(rcv_c)]
            rid_keep_m = [
                F.col("__rid").alias(rid_c),
                F.col("__rcv").alias(rcv_c)]
            rid_upd_m = [
                F.col("__rid").alias(rid_c),
                F.lit(None).cast("long").alias(rcv_c)]
            rid_ins = [
                F.lit(None).cast("long").alias(rid_c),
                F.lit(None).cast("long").alias(rcv_c)]
        else:
            rid_keep = rid_keep_m = rid_upd_m = rid_ins = []
        cdc_parts: List[DataFrame] = []
        parts = []
        # target rows in touched files with no source match: keep as-is
        # (the one remaining join against target data — bounded to the
        # touched-file subset)
        parts.append(touched_df.join(src, cond, "left_anti")
                     .select(*[F.col(f"t.{c}").alias(c) for c in tcols],
                             *rid_keep))
        matched_t = matched_m.select(
            *[F.col(f"__t_{c}").alias(c) for c in tcols], *rid_keep_m)
        if when_matched_update is not None:
            upd = matched_m.select(*[
                (F.col(f"__u_{c}")
                 if c in when_matched_update else F.col(f"__t_{c}"))
                .alias(c) for c in tcols], *rid_upd_m)
            # Recompute generated columns the SET list doesn't assign
            # (delta-spark recomputes on update; validating the stale
            # pre-update value against the expression would always
            # fail when a source column changed).
            for g, (gdt, gexpr) in gens.items():
                if g not in when_matched_update:
                    upd = upd.withColumn(g, F.expr(gexpr).cast(gdt))
            parts.append(upd)
            cdc_parts.append(matched_t.withColumn(
                CHANGE_TYPE_COL, F.lit("update_preimage")))
            cdc_parts.append(upd.withColumn(
                CHANGE_TYPE_COL, F.lit("update_postimage")))
        elif when_matched_delete:
            cdc_parts.append(matched_t.withColumn(
                CHANGE_TYPE_COL, F.lit("delete")))
        else:
            parts.append(matched_t)
        if when_not_matched_insert:
            scols = set(source.columns)
            ins = (src.join(target, cond, "left_anti")
                   .select(*[(F.col(f"s.{c}") if c in scols
                              else F.lit(None)).alias(c) for c in tcols],
                           *rid_ins))
            # Compute generated columns the source doesn't carry —
            # the NULL placeholder injected above is not a user-
            # supplied value and must not be validated against the
            # expression (delta-spark computes generated columns in
            # the insert path).
            for g, (gdt, gexpr) in gens.items():
                if g not in scols:
                    ins = ins.withColumn(g, F.expr(gexpr).cast(gdt))
            # Identity columns: allocate fresh values for inserted rows
            # (GENERATED ALWAYS AS IDENTITY can never come from the
            # source) and stage the advanced high-water mark on this
            # txn — same commit as the data, like _apply_identity.
            idcols = _identity_cols(meta)
            if idcols:
                if any(c in scols for c in idcols):
                    raise DeltaError(
                        f"columns {sorted(set(idcols) & scols)} are "
                        f"GENERATED ALWAYS AS IDENTITY and cannot be "
                        f"supplied by the merge source")
                ins = _apply_identity(
                    txn, ins.drop(*idcols), txn.new_metadata or meta)
            parts.append(ins)
            cdc_parts.append(ins.withColumn(
                CHANGE_TYPE_COL, F.lit("insert")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)

        # parts[0] is always the kept (unchanged) rows; everything after
        # carries new or rewritten values that can violate a constraint.
        for p in parts[1:]:
            _enforce_constraints(p, meta.configuration, "merged")
            _enforce_invariants(p, meta, "merged")
            _fill_and_check_generated(p, meta, "merged")
        cdc = None
        if cdc_parts and TableConfig(snap.metadata.configuration) \
                .enable_change_data_feed:
            # cdc_parts already carry the materialized id/commit-version
            # columns (rid_keep/rid_upd/rid_ins): delete and pre/post
            # images keep the row's id; inserted rows are NULL — their
            # fresh ids are assigned commit-side from the new file's
            # baseRowId, which no pre-commit CDC write can know
            # (disclosed in streaming/cdf.py).
            cdc = cdc_parts[0]
            for p in cdc_parts[1:]:
                cdc = cdc.unionByName(p)
        # rewrite + change rows in ONE write job (r15, __is_cdc staging
        # split — see stage_and_collect). The insert leg appears in
        # both the data and cdc legs of that one plan; its anti-join
        # subtrees are identical, so the exchange is reused rather
        # than re-scanned.
        staged = stage_and_collect(
            out, self.log.table_path, meta.partitionColumns,
            num_indexed_cols=_n_indexed(meta.configuration),
            bloom_cfg=_bloom(meta.configuration),
            physical_meta=meta, cdc_df=cdc)
        adds, cdcs = staged if cdc is not None else (staged, [])
        now = int(time.time() * 1000)
        actions: List[Any] = (list(adds)
                              + [f.remove(now) for f in touched_adds]
                              + list(cdcs))
        return txn.commit(actions, "MERGE", {"predicate": str(condition)})

    # ----------------------------------------------------------- changes

    def changes_df(self, start_version: int = 0,
                   end_version: Optional[int] = None,
                   ignore_deletes: bool = False,
                   ignore_changes: bool = False,
                   allow_initial_changes: bool = False) -> DataFrame:
        """Rows added in [start_version, end_version] with a ``_commit_version``
        column; per-version validation per ST3 (ActionProcessor.java:56-110)."""
        from .streaming.changes import changes_df
        return changes_df(self, start_version, end_version,
                          ignore_deletes=ignore_deletes,
                          ignore_changes=ignore_changes,
                          allow_initial_changes=allow_initial_changes)

    # ------------------------------------------------------- constraints

    def set_nullable(self, name: str, nullable: bool = True) -> int:
        """ALTER COLUMN ... {DROP | SET} NOT NULL. Relaxing is a
        metadata-only commit; TIGHTENING first validates the whole
        current table has no NULLs in the column (one scan, same
        stance as add_constraint) so the invariant is true from the
        moment it is declared."""
        import dataclasses
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        meta = snap.metadata
        field = next((f for f in meta.schema.fields if f.name == name),
                     None)
        if field is None:
            raise DeltaError(f"no such column: {name!r}")
        if field.nullable == nullable:
            return snap.version
        if not nullable:
            txn.read_whole_table()
            bad = snap.to_df().where(F.col(name).isNull()).limit(1)
            if bad.collect():
                raise DeltaError(
                    f"cannot SET NOT NULL on {name!r}: existing rows "
                    f"contain NULLs")
        fields = [T.StructField(f.name, f.dataType,
                                nullable if f.name == name else f.nullable,
                                f.metadata)
                  for f in meta.schema.fields]
        # the generic evolution guard refuses tightening (correct for
        # WRITE-time evolution); this ALTER just validated the data,
        # so it bypasses like RESTORE does
        txn.update_metadata(dataclasses.replace(
            meta, schemaString=json.dumps(
                T.StructType(fields).jsonValue())),
            overwrite_schema=not nullable)
        return txn.commit([], "ALTER COLUMN",
                          {"column": name,
                           "nullable": str(nullable).lower()})

    def add_constraint(self, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT: validate the WHOLE current table
        satisfies ``expr`` (one scan), then commit a Metadata whose
        configuration carries ``delta.constraints.<name>``. Every later
        data-adding commit re-validates its own rows (_enforce_constraints)."""
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        key = f"delta.constraints.{name.lower()}"
        if key in snap.metadata.configuration:
            raise DeltaError(f"constraint {name!r} already exists")
        txn.read_whole_table()
        _enforce_constraints(
            snap.to_df(), {key: expr}, "existing")
        meta = snap.metadata
        import dataclasses
        new_meta = dataclasses.replace(
            meta, configuration={**meta.configuration, key: expr})
        txn.update_metadata(new_meta)
        return txn.commit([], "ADD CONSTRAINT",
                          {"name": name, "expr": expr})

    def drop_constraint(self, name: str) -> int:
        txn = self.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        key = f"delta.constraints.{name.lower()}"
        if key not in snap.metadata.configuration:
            raise DeltaError(f"constraint {name!r} does not exist")
        meta = snap.metadata
        conf = {k: v for k, v in meta.configuration.items() if k != key}
        import dataclasses
        new_meta = dataclasses.replace(meta, configuration=conf)
        txn.update_metadata(new_meta)
        return txn.commit([], "DROP CONSTRAINT", {"name": name})

    def table_changes(self, start_version: int = 0,
                      end_version: Optional[int] = None,
                      with_row_ids: bool = False) -> DataFrame:
        """Row-level Change Data Feed: table columns + ``_change_type``
        (insert / delete / update_preimage / update_postimage) +
        ``_commit_version``. DML commits describe their changes exactly via
        CDC files when ``delta.enableChangeDataFeed`` is set; other commits
        synthesize inserts/deletes from their dataChange actions
        (streaming/cdf.py; reference action model actions.scala:164-172).
        ``with_row_ids=True`` (row-tracked tables) appends ``_row_id`` /
        ``_row_commit_version`` to each change row."""
        from .streaming.cdf import table_changes
        return table_changes(self, start_version, end_version,
                             with_row_ids=with_row_ids)

    def table_changes_by_timestamp(
            self, start_ts_ms: int,
            end_ts_ms: Optional[int] = None) -> DataFrame:
        """Change Data Feed bounded by TIMESTAMPS instead of versions
        (delta-spark's startingTimestamp/endingTimestamp option pair):
        start resolves to the first commit at-or-after it, end to the
        last commit at-or-before it, against the monotonized history
        (log/history.py) — well-defined even under commit-file
        clock skew. An empty window returns an empty frame."""
        start_v = self.log.version_at_or_after_timestamp(start_ts_ms)
        if end_ts_ms is None:
            return self.table_changes(start_v)
        end_v = self.log.version_before_or_at_timestamp(end_ts_ms)
        if end_v < start_v:
            # empty window between two commits: right schema, no rows
            return self.table_changes(start_v, start_v).limit(0)
        return self.table_changes(start_v, end_v)

    # ------------------------------------------------------------- clone

    def clone_to(self, target_path: str, version: Optional[int] = None,
                 timestamp_ms: Optional[int] = None,
                 deep: bool = False) -> Dict[str, Any]:
        """CLONE this table (optionally at an earlier version/timestamp)
        into a new table at ``target_path``.

        Shallow (default): the clone's AddFiles reference the source's
        data files by ABSOLUTE path — zero data movement, O(#files)
        metadata work, so cloning a 100 TB table commits in seconds.
        The clone is then fully independent: DML on it copy-on-writes
        new files under the clone's own root (untouched files keep
        pointing at the source), VACUUM on the clone never deletes
        outside its root, and the source's history/log is not shared
        (the clone starts at version 0). This is Delta's
        ``CLONE ... SHALLOW`` / the absolute-path AddFile protocol the
        reference resolves in SnapshotImpl.canonicalizePath
        (SnapshotImpl.scala:349-362) and FileNames.absolutePath
        (FileNames.scala:100-107).

        Deep: additionally copies every active data file under the
        target root (relative paths). The DATA MOVEMENT — the 100 TB
        part — runs as a distributed job over the file list through the
        store; the driver builds only the action list (inherent: the
        commit enumerates the files either way).

        The target must not already exist. Returns
        {version, sourceVersion, filesCloned, bytesCloned}.
        """
        import dataclasses
        src = self._resolve(version, timestamp_ms)
        tgt_log = DeltaLog.for_table(self.spark, target_path)
        txn = tgt_log.start_transaction()
        if txn.snapshot is not None and txn.read_version >= 0:
            raise DeltaError(f"CLONE target already exists: {target_path}")
        now = int(time.time() * 1000)
        txn.update_metadata(dataclasses.replace(
            src.metadata, id=str(uuid.uuid4()), createdTime=now))
        tgt_root = tgt_log.table_path
        src_root = src.table_path
        # commit-width metrics come from ONE aggregate, not a driver
        # loop over the file list
        row = (src.files_df
               .agg(F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum("size"), F.lit(0)).alias("b"))
               .first())
        n_files, bytes_cloned = int(row["n"]), int(row["b"])

        def _dest_rel(absolute: str) -> str:
            # deterministic (md5-derived, not uuid): the deep-copy job
            # and the streamed action pass compute it independently
            if absolute.startswith(src_root + "/"):
                return os.path.relpath(absolute, src_root)
            digest = hashlib.md5(absolute.encode()).hexdigest()
            return f"{digest}-{os.path.basename(absolute)}"

        def files_factory():
            # streamed off the file-set DataFrame: the driver holds ONE
            # action at a time (VERDICT r10 #8), the commit JSON is
            # written incrementally through the LogStore. Paths are
            # yielded CANONICAL-ABSOLUTE (physical) and encoded exactly
            # once by the commit's relativize — pre-quoting here
            # double-encoded shallow-clone refs once canonical_path
            # became idempotent (r15), and for Hive-escaped partition
            # dirs the old decode+requote round trip corrupted them.
            from .log.snapshot import addfiles_from_rows
            for r in src.files_df.toLocalIterator():
                f = addfiles_from_rows([r])[0]
                absolute = _canonical(f.path, src_root)
                new_path = (os.path.join(tgt_root, _dest_rel(absolute))
                            if deep else absolute)
                yield dataclasses.replace(
                    f, path=new_path, dataChange=True,
                    modificationTime=now)

        if deep and n_files:
            import pandas as pd
            from .shipping import ensure_shipped_by_value
            ensure_shipped_by_value()
            store = tgt_log.store

            def copy_files(batches):
                for pdf in batches:
                    n = 0
                    for p in pdf["path"]:
                        absolute = _canonical(p, src_root)
                        store.copy_file(
                            absolute,
                            os.path.join(tgt_root, _dest_rel(absolute)))
                        n += 1
                    yield pd.DataFrame({"n": [n]})

            n_parts = min(n_files,
                          self.spark.sparkContext.defaultParallelism) or 1
            copied = (src.files_df.select("path")
                      .repartition(n_parts)
                      .mapInPandas(copy_files, "n long")
                      .agg(F.sum("n")).collect()[0][0])
            assert copied == n_files, (copied, n_files)
        head: List[Any] = []
        if (src.protocol.minReaderVersion,
                src.protocol.minWriterVersion) != (1, 2):
            # a feature-protocol source (column mapping, DVs) keeps its
            # protocol on the clone — the cloned AddFiles carry the same
            # physical names / DV tags, so a legacy-reader-refuses gate
            # must survive the clone
            head.append(src.protocol)
        ver = txn.commit_stream(
            head, files_factory, has_removes=False, data_change=True,
            operation="CLONE",
            operation_parameters={"source": self.path,
                                  "sourceVersion": str(src.version),
                                  "isShallow": json.dumps(not deep)},
            operation_metrics={"numClonedFiles": str(n_files),
                               "clonedBytes": str(bytes_cloned)})
        return {"version": ver, "sourceVersion": src.version,
                "filesCloned": n_files, "bytesCloned": bytes_cloned}


def _bloom(configuration):
    """Bloom-skipping write config (columns, m, k) or None — see
    connectors_spark/bloom.py."""
    from .bloom import bloom_config
    return bloom_config(configuration)


def _parse_dtype(ddl: str):
    """DataType from a DDL string ('bigint', 'array<string>', ...)."""
    try:
        return T.DataType.fromDDL(ddl)
    except AttributeError:                      # older pyspark
        return T._parse_datatype_string(ddl)


def _n_indexed(configuration) -> int:
    """delta.dataSkippingNumIndexedCols for a metadata configuration."""
    return TableConfig(configuration or {}).data_skipping_num_indexed_cols


def _canonical(path: str, table_path: str) -> str:
    from .log.snapshot import canonical_path
    return canonical_path(path, table_path)


def _semi_by_paths(df: DataFrame, paths: Sequence[str],
                   col: str = "path") -> DataFrame:
    """Subset of ``df`` whose ``col`` is in ``paths``, via a left-semi
    join against a paths DataFrame — never an ``isin`` literal. A wide
    DML/OPTIMIZE over 100k files must not embed a 100k-element In() in
    the plan (driver memory + plan-size blowup); the candidate list is
    already driver-side (it becomes the commit's RemoveFile list), so
    feeding it back as a local relation costs nothing extra. Same shape
    as merge's touched-file scoping (see merge())."""
    from .localrel import local_rows_df
    pdf = local_rows_df(df.sparkSession, [(p,) for p in paths],
                        f"{col}: string")
    return df.join(pdf, col, "left_semi")


def _enforce_constraints(df: DataFrame, configuration: Dict[str, str],
                         what: str) -> None:
    """Reject the commit if any row violates a CHECK constraint. SQL
    semantics: a row passes when the expression is TRUE or NULL; only
    FALSE violates. One filter scan per constrained batch -- the filter
    pushes into the batch's source scan, and the batch being committed is
    (at 100 TB) vastly smaller than the table it lands in."""
    checks = TableConfig(configuration).check_constraints
    if not checks:
        return
    for name in sorted(checks):
        expr = checks[name]
        bad = F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
        row = df.where(~bad).limit(1).collect()
        if row:
            raise DeltaError(
                f"CHECK constraint {name} ({expr}) violated by {what} "
                f"row: {row[0].asDict()}")


_INVARIANT_KEY = "delta.invariants"


def _enforce_invariants(df: DataFrame, meta, what: str) -> None:
    """Writer-version-2 INVARIANTS (the feature Protocol(1,2) already
    claims — actions.scala:31-35; Delta spec "Column Invariants"):

    - a top-level field with ``nullable = false`` rejects NULL values
      (NOT NULL enforcement; nested fields are out of scope and a
      nested non-null spec never silently passes — there is no
      nested-write path that drops the check, because writes conform
      to the table schema before this point);
    - field metadata ``delta.invariants`` carries a JSON-wrapped SQL
      expression ({"expression": {"expression": "<sql>"}}) that every
      row must satisfy (TRUE or NULL passes, FALSE violates — the
      same three-valued rule as CHECK constraints).

    One combined filter scan per batch (conditions AND-folded), so the
    cost stance matches _enforce_constraints — including its
    disclosed caveat: the check re-evaluates the batch lineage, so a
    NONDETERMINISTIC source could pass validation yet write different
    rows. The paths where that hazard is live already materialize
    first (merge's localCheckpoint'd source, identity allocation);
    plain appends of nondeterministic frames share the caveat with
    CHECK constraints."""
    conds = []
    labels = []
    for f in meta.schema.fields:
        if f.name not in df.columns:
            continue
        if not f.nullable:
            conds.append(F.col(f.name).isNotNull())
            labels.append((f"NOT NULL column {f.name!r}",
                           conds[-1]))
        inv = (f.metadata or {}).get(_INVARIANT_KEY)
        if inv:
            try:
                expr = json.loads(inv)["expression"]["expression"]
            except (ValueError, KeyError, TypeError):
                raise DeltaError(
                    f"malformed {_INVARIANT_KEY} on column "
                    f"{f.name!r}: {inv!r}")
            ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
            conds.append(ok)
            labels.append((f"invariant on {f.name!r} ({expr})", ok))
    if not conds:
        return
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    row = df.where(~keep).limit(1).collect()
    if row:
        # one more tiny pass to NAME the violated rule (error-path only)
        for label, c in labels:
            if df.where(~c).limit(1).collect():
                raise DeltaError(
                    f"{label} violated by {what} row: "
                    f"{row[0].asDict()}")
        raise DeltaError(
            f"invariant violated by {what} row: {row[0].asDict()}")


_GEN_KEY = "delta.generationExpression"


def _generated_exprs(meta) -> Dict[str, Tuple[Any, str]]:
    """name -> (dataType, expression) for GENERATED ALWAYS AS columns
    (field metadata key delta.generationExpression — the Delta
    protocol's representation)."""
    out: Dict[str, Tuple[Any, str]] = {}
    for f in meta.schema.fields:
        expr = (f.metadata or {}).get(_GEN_KEY)
        if expr:
            out[f.name] = (f.dataType, expr)
    return out


def _fill_and_check_generated(df: DataFrame, meta, what: str) -> DataFrame:
    """Generated-column contract on a data-adding batch: an ABSENT
    generated column is computed from its expression; a PRESENT one is
    validated row-wise against it (null-safe equality — supplying a
    divergent value is an error, exactly delta-spark's rule). One
    limit-1 probe per supplied generated column, same cost stance as
    CHECK constraints."""
    gens = _generated_exprs(meta)
    if not gens:
        return df
    for name, (dtype, expr) in gens.items():
        val = F.expr(expr).cast(dtype)
        if name not in df.columns:
            df = df.withColumn(name, val)
            continue
        bad = df.where(~F.col(name).eqNullSafe(val)).limit(1).collect()
        if bad:
            raise DeltaError(
                f"generated column {name!r} (GENERATED ALWAYS AS "
                f"{expr}) violated by {what} row: {bad[0].asDict()}")
    return df


_ID_START = "delta.identity.start"
_ID_STEP = "delta.identity.step"
_ID_HWM = "delta.identity.highWaterMark"


def _identity_cols(meta) -> Dict[str, Tuple[Any, int, int, int]]:
    """name -> (dataType, start, step, highWaterMark) for GENERATED
    ALWAYS AS IDENTITY columns (the Delta protocol's field-metadata
    keys; the high-water mark advances via the same metadata commit
    that adds the rows, so concurrent allocators conflict-check like
    any metadata writers)."""
    out: Dict[str, Tuple[Any, int, int, int]] = {}
    for f in meta.schema.fields:
        md = f.metadata or {}
        if _ID_START in md:
            start, step = int(md[_ID_START]), int(md[_ID_STEP])
            hwm = int(md.get(_ID_HWM, start - step))
            out[f.name] = (f.dataType, start, step, hwm)
    return out


def _allocate_identity(df: DataFrame, name: str, dtype, step: int,
                       hwm: int) -> Tuple[DataFrame, int]:
    """Allocate the next n identity values across the frame with ZERO
    shuffle: monotonically_increasing_id encodes (partition id << 33 |
    row number), so with one tiny per-partition count pass the global
    index is a narrow expression — no window, no single-task funnel,
    no repartition. Values are unique and the allocated SET is exactly
    {hwm+step, ..., hwm+step*n}; the row→value assignment follows the
    frame's physical partitioning (like delta-spark's allocator).
    Returns (df with the column, new high-water mark).

    The counts pass and the eventual write are two Spark jobs over the
    same frame, so the partition layout MUST be identical between them:
    a nondeterministic upstream (sample/limit/rand/shuffle replay) or
    an AQE re-coalesce would otherwise skew the offsets and produce
    duplicate or skipped ids. localCheckpoint pins the partitions once
    (same defence merge() uses for its thrice-referenced source)."""
    df = df.localCheckpoint(eager=True)
    counts = {r["_pid"]: r["cnt"] for r in
              df.groupBy(F.spark_partition_id().alias("_pid"))
              .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n = sum(counts.values())
    if n == 0:
        return df.withColumn(name, F.lit(None).cast(dtype)), hwm
    max_pid = max(counts)
    offsets, acc = [], 0
    for pid in range(max_pid + 1):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    off_arr = F.array(*[F.lit(o).cast("long") for o in offsets])
    mid = F.monotonically_increasing_id()
    pid = (mid / F.lit(1 << 33)).cast("long")
    rn = mid % F.lit(1 << 33)
    gidx = F.element_at(off_arr, (pid + 1).cast("int")) + rn
    val = (F.lit(hwm) + F.lit(step) * (gidx + F.lit(1))).cast(dtype)
    return df.withColumn(name, val), hwm + step * n


def _apply_identity(txn, df: DataFrame, meta) -> DataFrame:
    """Fill every identity column of a batch being written and stage
    the advanced high-water marks as a metadata update on ``txn``
    (same commit as the adds). Supplying the column explicitly is
    refused — GENERATED ALWAYS AS IDENTITY, delta-spark's default."""
    import dataclasses
    ids = _identity_cols(meta)
    if not ids:
        return df
    fields = {f.name: f for f in meta.schema.fields}
    changed = False
    for name, (dtype, start, step, hwm) in ids.items():
        if name in df.columns:
            raise DeltaError(
                f"column {name!r} is GENERATED ALWAYS AS IDENTITY and "
                f"cannot be written to")
        df, new_hwm = _allocate_identity(df, name, dtype, step, hwm)
        if new_hwm != hwm:
            f = fields[name]
            md = dict(f.metadata or {})
            md[_ID_HWM] = new_hwm
            fields[name] = T.StructField(f.name, f.dataType,
                                         f.nullable, md)
            changed = True
    if changed:
        base = txn.new_metadata or meta
        new_schema = T.StructType(
            [fields.get(f.name, f) for f in meta.schema.fields])
        # Refine (not duplicate) any already-staged metadata update so
        # the commit still carries exactly one Metadata action.
        txn.new_metadata = None
        txn.update_metadata(dataclasses.replace(
            base, schemaString=json.dumps(new_schema.jsonValue())))
    return df


_ZORDER_BITS = 16


def _zorder_numeric(df: DataFrame, c: str) -> F.Column:
    """Order-preserving numeric rank of any Z-orderable column. Strings
    map to their first 7 UTF-8 bytes as a big-endian integer
    (zero-right-padded so shorter strings don't leapfrog longer ones —
    byte-wise order IS code-point order for UTF-8); dates route through
    timestamp; numerics/timestamps cast directly. 7 bytes keeps the
    value positive in a signed long and within double's exact-integer
    range up to the precision the bucketing needs."""
    dt = dict(df.dtypes)[c]
    if dt == "string":
        return F.conv(
            F.hex(F.rpad(F.encode(F.col(c), "UTF-8"), 7,
                         F.lit(b"\x00"))), 16, 10).cast("double")
    if dt == "date":
        return F.col(c).cast("timestamp").cast("double")
    return F.col(c).cast("double")


def _bucket_ids(df: DataFrame, cols: List[str],
                n_bits: int) -> List[F.Column]:
    """Equi-width bucket id (long, 0..2^n_bits-1) per clustering column
    (numeric, timestamp, date, or string — see _zorder_numeric). Bucket
    bounds come from one min/max aggregate (driver-side, 2 numbers per
    column). Nulls sort first (bucket 0)."""
    exprs = {c: _zorder_numeric(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(exprs[c]).alias(f"_lo_{c}") for c in cols],
        *[F.max(exprs[c]).alias(f"_hi_{c}") for c in cols]).first()
    n_buckets = 1 << n_bits
    bucket_cols = []
    for c in cols:
        lo = float(bounds[f"_lo_{c}"] or 0.0)
        hi = float(bounds[f"_hi_{c}"] or 0.0)
        width = (hi - lo) or 1.0
        b = F.floor((exprs[c] - F.lit(lo)) /
                    F.lit(width) * n_buckets).cast("long")
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1))
        bucket_cols.append(F.coalesce(b, F.lit(0)))
    return bucket_cols


def _zorder_code(df: DataFrame, cols: List[str]) -> F.Column:
    """Morton code over equi-width bucket ids of the given columns;
    the interleave is a codegen'd bit expression."""
    bucket_cols = _bucket_ids(df, cols, _ZORDER_BITS)
    code = F.lit(0).cast("long")
    k = len(cols)
    for bit in range(_ZORDER_BITS):
        for j, b in enumerate(bucket_cols):
            code = code + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                bit * k + j)
    return code


def _hilbert_index_col(bucket_cols: List[F.Column],
                       bits: int) -> F.Column:
    """Hilbert index (long) of d bucket-id Columns, ``bits`` bits each —
    Skilling's AxesToTranspose (AIP Conf. Proc. 707, 2004) as a pure
    Column expression, entirely JVM-side.

    The per-level rotation loop runs inside F.aggregate over the
    descending Q-value array: each level's state is an array<long>
    bound to a lambda variable, so re-referencing X[0] d times per
    level costs a NamedLambdaVariable leaf, not a copy of the whole
    subtree (an unrolled withColumn chain would re-inline and grow the
    tree exponentially after CollapseProject). Gray encode + the final
    bit interleave run in the aggregate's finish lambda for the same
    reason."""
    d = len(bucket_cols)

    def merge(acc, q):
        X = [F.element_at(acc, i + 1) for i in range(d)]
        P = q - F.lit(1).cast("long")
        for i in range(d):
            cond = X[i].bitwiseAND(q) != F.lit(0)
            if i == 0:
                # t = (X[0]^X[0]) & P == 0: the else branch is a no-op
                X[0] = F.when(cond, X[0].bitwiseXOR(P)).otherwise(X[0])
                continue
            t = X[0].bitwiseXOR(X[i]).bitwiseAND(P)
            x0 = F.when(cond, X[0].bitwiseXOR(P)) \
                .otherwise(X[0].bitwiseXOR(t))
            xi = F.when(cond, X[i]).otherwise(X[i].bitwiseXOR(t))
            X[0], X[i] = x0, xi
        return F.array(*X)

    def finish(acc):
        X = [F.element_at(acc, i + 1) for i in range(d)]
        for i in range(1, d):                  # Gray encode (prefix ^)
            X[i] = X[i].bitwiseXOR(X[i - 1])
        # t = XOR over e>0 of (2^e - 1 when bit e of X[d-1] is set).
        # Closed form per output bit j: parity of X[d-1] >> (j+1) —
        # expressed with bit_count so the tree is LINEAR in bits (the
        # literal when-chain re-embeds t twice per level → 2^bits
        # nodes; it OOMed analysis at 16 bits).
        t = F.lit(0).cast("long")
        for j in range(bits - 1):
            par = F.bit_count(F.shiftright(X[d - 1], j + 1)) \
                .cast("long").bitwiseAND(F.lit(1))
            t = t + F.shiftleft(par, j)
        X = [x.bitwiseXOR(t) for x in X]
        h = F.lit(0).cast("long")
        for p in range(bits - 1, -1, -1):      # transpose → index
            for i in range(d):
                h = F.shiftleft(h, 1) \
                    + F.shiftright(X[i], p).bitwiseAND(F.lit(1))
        return h

    init = F.array(*[b.cast("long") for b in bucket_cols])
    qs = F.array(*[F.lit(1 << e).cast("long")
                   for e in range(bits - 1, 0, -1)])
    return F.aggregate(qs, init, merge, finish)


def _hilbert_index_np(X, bits: int):
    """Vectorized Skilling AxesToTranspose over a (d, n) int64 bucket
    array → (n,) int64 Hilbert indices. Identical ints to
    _hilbert_index_col / the tests' Python reference — the loops here
    run over LEVELS and DIMENSIONS only; every per-row operation is a
    whole-array numpy bit op."""
    import numpy as np
    d = X.shape[0]
    X = X.astype(np.int64, copy=True)
    Q = np.int64(1) << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(d):
            x0, xi = X[0], X[i]
            mask = (xi & Q) != 0
            if i == 0:
                X[0] = np.where(mask, x0 ^ P, x0)
                continue
            t = (x0 ^ xi) & P
            X[0] = np.where(mask, x0 ^ P, x0 ^ t)
            X[i] = np.where(mask, xi, xi ^ t)
        Q >>= 1
    for i in range(1, d):                      # Gray encode (prefix ^)
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = np.int64(1) << (bits - 1)
    while Q > 1:
        t = np.where((X[d - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    X ^= t
    h = np.zeros_like(X[0])
    for p in range(bits - 1, -1, -1):          # bit interleave
        for i in range(d):
            h = (h << 1) | ((X[i] >> np.int64(p)) & 1)
    return h


def _hilbert_code(df: DataFrame, cols: List[str]) -> F.Column:
    """Hilbert-curve cluster code over equi-width bucket ids — the
    same bucketing as Z-order but walked along the Hilbert curve.

    Why offer both: Morton order has quadrant-boundary jumps (the code
    teleports across the key space every power-of-two boundary), so a
    contiguous code range — one output file — can cover two far-apart
    rectangles and its min/max stats widen on every clustered column.
    The Hilbert curve is a unit-step Hamiltonian path over the bucket
    grid (adjacent codes are adjacent cells), so equal-size code
    ranges cover tighter hyper-rectangles: measurably better per-file
    min/max selectivity at the same rewrite cost — the reason
    Databricks liquid clustering walks Hilbert, not Morton. Bits per
    dimension shrink with d so the index stays in a signed long.

    Hot path is an Arrow-batched pandas_udf over the vectorized
    Skilling transform (_hilbert_index_np): the pure-Column form
    (_hilbert_index_col, kept for parity tests) expresses the level
    loop as a higher-order F.aggregate, which Spark evaluates
    INTERPRETED per row — the sf1 sweep measured the Hilbert rewrite
    at 339 s vs <12 s for the codegen'd Morton interleave. The numpy
    form computes identical ints (equality pinned against both the
    Column form and the Skilling reference) with level/dimension loops
    only — every per-row op is a whole-batch bit op."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .shipping import ensure_shipped_by_value
    ensure_shipped_by_value()
    bits = min(_ZORDER_BITS, 63 // max(len(cols), 1))

    def _hidx(*xs):
        import numpy as np
        X = np.stack([x.to_numpy(dtype=np.int64) for x in xs])
        return pd.Series(_hilbert_index_np(X, bits))

    # functional form (no type hints): the decorator's hint inference
    # rejects *args signatures
    hidx = pandas_udf(_hidx, "long")
    return hidx(*_bucket_ids(df, cols, bits))


def _compact_log_range(log, table_path: str, start: int,
                       end: int) -> Dict[str, int]:
    """Net-fold the delta range [start, end] into
    ``<start>.<end>.compacted.json`` (the shared core of
    TableMaintenance.compact_log and post-commit auto-compaction).

    The fold keys add/remove actions by CANONICAL path, exactly as
    snapshot replay dedups (canonical_path, SnapshotImpl.scala:349-362):
    a foreign-written log may spell the same file two ways (relative vs
    file:// absolute, escaped vs not) and keying by the raw string would
    retain BOTH the add and the later remove — replay's same-version
    "add wins" tiebreak would then resurrect a deleted file. The
    retained action keeps its original (last-seen) spelling.

    Best-effort publish: two racing compactors of the same range write
    identical content, so losing the put-if-absent race is a no-op; any
    other failure propagates."""
    from .log import filenames as fn
    from .log.actions import (AddCDCFile, AddFile, CommitInfo,
                              DomainMetadata, Metadata, Protocol,
                              RemoveFile, SetTransaction, from_json_line,
                              to_json_line)
    from .log.logstore import FileAlreadyExistsError
    per_path: Dict[str, Any] = {}
    meta = proto = None
    txns: Dict[str, Any] = {}
    domains: Dict[str, Any] = {}
    n_in = 0
    for v in range(start, end + 1):
        for line in log.store.read(fn.delta_file(log.log_path, v)):
            a = from_json_line(line)
            if a is None or isinstance(a, (CommitInfo, AddCDCFile)):
                continue
            n_in += 1
            if isinstance(a, AddFile) or isinstance(a, RemoveFile):
                per_path[canonical_path(a.path, table_path)] = a
            elif isinstance(a, Metadata):
                meta = a
            elif isinstance(a, Protocol):
                proto = a
            elif isinstance(a, SetTransaction):
                txns[a.appId] = a
            elif isinstance(a, DomainMetadata):
                # net fold per domain; removed=True tombstones are
                # RETAINED (they must keep overriding an entry an older
                # checkpoint still carries)
                domains[a.domain] = a
    acts: List[Any] = []
    if proto is not None:
        acts.append(proto)
    if meta is not None:
        acts.append(meta)
    acts += [txns[k] for k in sorted(txns)]
    acts += [domains[k] for k in sorted(domains)]
    acts += [per_path[p] for p in sorted(per_path)]
    target = fn.compacted_file(log.log_path, start, end)
    try:
        log.store.write(target, [to_json_line(a) for a in acts],
                        overwrite=False)
    except FileAlreadyExistsError:
        pass  # lost the race to an IDENTICAL file — a no-op
    return {"start": start, "end": end, "actionsIn": n_in,
            "actionsOut": len(acts)}


class TableMaintenance:
    """OPTIMIZE (small-file bin-packing) and VACUUM (physical removal of
    unreferenced files) — the operational pair that keeps a 100 TB table
    healthy: streaming sinks produce one file per partition per batch,
    compaction folds them back into scan-efficient ~128 MB files, and
    vacuum reclaims the space the rewrites (and DML) tombstoned.

    OPTIMIZE commits with dataChange=False on both adds and removes, so
    change feeds (ST3 validation filters on dataChange) skip compaction
    commits and SnapshotIsolation suffices — matching how the reference
    distinguishes data- from file-layout transactions
    (isolationLevels.scala:19-25, actions.scala:109-132 dataChange).
    """

    def __init__(self, table: DeltaTable):
        self.table = table

    def optimize(self, target_file_size: int = 128 * 1024 * 1024,
                 min_files_per_group: int = 2,
                 zorder_by: Optional[List[str]] = None,
                 hilbert_by: Optional[List[str]] = None,
                 max_actions_per_commit: int = 100_000,
                 where: Optional[Expression] = None) -> Dict[str, int]:
        """Bin-pack files smaller than ``target_file_size``, grouped by
        partition tuple. With ``zorder_by``, ALL files are rewritten
        Z-order-clustered on the given numeric columns instead: rows are
        range-partitioned and sorted by a Morton (bit-interleaved) code
        over equi-width bucket ids, so each output file covers a compact
        hyper-rectangle and per-file min/max stats become selective on
        EVERY clustered column — stats-based skipping (scan.py) then
        prunes on any of them, the multi-column layout the reference
        carries stats for but never exploits (actions.scala:116-117).
        ``hilbert_by`` clusters along the Hilbert curve instead of
        Morton (see _hilbert_code for why that tightens per-file
        min/max at the same rewrite cost).

        ``max_actions_per_commit`` bounds the WIDTH of each commit: a
        full-table compaction over millions of small files must not
        funnel every AddFile/RemoveFile into one driver list and one
        giant commit JSON. Work is split into batches of whole
        partition groups (an oversized group is itself split for
        bin-packing; a clustered group stays atomic so its curve
        ordering is never torn) and each batch commits separately —
        ``dataChange=False`` keeps change feeds quiet, and each batch
        conflict-checks like any OPTIMIZE (concurrent-safety matrix in
        tests/test_concurrency.py). A reader between batches sees a
        partially-compacted but always-correct table. Returns
        {filesRemoved, filesAdded, version (last)}."""
        if zorder_by and hilbert_by:
            raise DeltaError("zorder_by and hilbert_by are mutually "
                             "exclusive")
        cluster_by = zorder_by or hilbert_by
        t = self.table
        txn = t.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        pcols = snap.metadata.partitionColumns
        if where is not None:
            # OPTIMIZE ... WHERE (delta-spark OptimizeTableCommand's
            # partitionPredicate): partition-column predicates only —
            # a data-column predicate can't select whole files and
            # would silently degrade to full-table, so refuse instead.
            extra = where.references() - set(pcols)
            if extra:
                raise DeltaError(
                    f"optimize WHERE may only reference partition "
                    f"columns {sorted(pcols)}; got {sorted(extra)}")
        # Pre-filter candidates IN the DataFrame: only bin-packable
        # files (or, for Z-order, the full rewrite set — inherent) are
        # collected; a mostly-compacted table collects near-nothing.
        from .log.snapshot import addfiles_from_rows
        cand_df = snap.files_local_df if cluster_by is not None \
            else snap.files_local_df.where(F.col("size") < target_file_size)
        if where is not None:
            from .scan import DeltaScan
            cand_df = cand_df.join(
                DeltaScan(snap, where).files().select("path"),
                "path", "left_semi")
        groups: Dict[Tuple, List[Any]] = {}
        for f in addfiles_from_rows(cand_df.collect()):
            key = tuple((c, (f.partitionValues or {}).get(c)) for c in pcols)
            groups.setdefault(key, []).append(f)
        min_group = 1 if cluster_by else min_files_per_group
        work = [fs for fs in groups.values() if len(fs) >= min_group]
        if not work:
            return {"filesRemoved": 0, "filesAdded": 0,
                    "version": snap.version}

        def est(fs):
            # commit width upper bound: removes + projected adds
            return len(fs) + max(1, -(-sum(f.size for f in fs)
                                      // target_file_size))

        units: List[List[Any]] = []
        for fs in work:
            if cluster_by is None and est(fs) > max_actions_per_commit:
                # oversized bin-pack group: split (still per-partition);
                # a tail chunk below min_files_per_group would be a
                # pointless 1-to-1 rewrite, so it folds into the
                # previous chunk instead
                step = max(min_files_per_group,
                           max_actions_per_commit // 2)
                chunks = [fs[i:i + step]
                          for i in range(0, len(fs), step)]
                if len(chunks) > 1 and len(chunks[-1]) < min_files_per_group:
                    chunks[-2].extend(chunks.pop())
                units.extend(chunks)
            else:
                units.append(fs)
        batches: List[List[Any]] = []
        cur: List[Any] = []
        cur_n = 0
        for u in units:
            if cur and cur_n + est(u) > max_actions_per_commit:
                batches.append(cur)
                cur, cur_n = [], 0
            cur.extend(u)
            cur_n += est(u)
        if cur:
            batches.append(cur)

        params = {"targetSize": str(target_file_size)}
        if zorder_by:
            params["zOrderBy"] = ",".join(zorder_by)
        if hilbert_by:
            params["clusterBy"] = ",".join(hilbert_by)
            params["curve"] = "hilbert"
        n_removed = n_added = 0
        version = snap.version
        for bi, victims in enumerate(batches):
            if bi > 0:
                # fresh txn per batch: its snapshot includes the prior
                # batch's commit, so each batch conflict-checks against
                # the current state like an independent OPTIMIZE
                txn = t.log.start_transaction()
                snap = txn.snapshot
            cand_paths = {_canonical(f.path, snap.table_path)
                          for f in victims}
            subset = [r for r in snap._files_rows
                      if r["path"] in cand_paths]
            if bi > 0:
                # victims were computed from the ORIGINAL snapshot; a
                # concurrent commit that removed one BEFORE this batch's
                # fresh txn started is not a "winning commit", so the
                # J4 delete/delete check would never fire and we'd
                # commit a duplicate RemoveFile (double-decrementing the
                # incremental .crc chain). Intersect with the fresh
                # snapshot's live files — `subset` rows ARE that
                # intersection, bounded by the batch width.
                live = {r["path"] for r in subset}
                victims = [f for f in victims
                           if _canonical(f.path, snap.table_path) in live]
                if not victims:
                    continue
            rt = TableConfig(
                snap.metadata.configuration).enable_row_tracking
            if rt:
                # Row tracking: a rewrite MATERIALIZES each row's id and
                # commit version into the written files (the spec's
                # stable-row-id requirement — fresh baseRowId+index ids
                # would renumber under compaction). The read side
                # prefers these columns when present.
                from .log.snapshot import materialized_rt_cols
                rid_c, rcv_c = materialized_rt_cols(snap.metadata)
                df = (snap.to_df(files=subset, with_row_ids=True)
                      .withColumnRenamed("_row_id", rid_c)
                      .withColumnRenamed("_row_commit_version", rcv_c))
            else:
                df = snap.to_df(files=subset)
            total = sum(f.size for f in victims)
            n_out = max(1, -(-total // target_file_size))
            if cluster_by:
                code = (_zorder_code(df, zorder_by) if zorder_by
                        else _hilbert_code(df, hilbert_by))
                df = df.withColumn("_z", code)
                df = (df.repartitionByRange(n_out, F.col("_z"))
                      .sortWithinPartitions("_z").drop("_z"))
            else:
                df = df.repartition(n_out)
            adds = stage_and_collect(
                df, t.path, pcols, data_change=False,
                num_indexed_cols=_n_indexed(snap.metadata.configuration),
                bloom_cfg=_bloom(snap.metadata.configuration),
                physical_meta=snap.metadata)
            now = int(time.time() * 1000)
            actions: List[Any] = list(adds) + [
                f.remove(now, data_change=False) for f in victims]
            if cluster_by:
                # record the clustering layout as table state (the
                # delta.clustering metadata domain delta-spark's liquid
                # clustering writes): readers and later OPTIMIZE runs
                # can discover WHICH columns the files are clustered on
                # without scanning history
                from .log.actions import DomainMetadata
                actions.append(DomainMetadata(
                    "delta.clustering",
                    json.dumps({"clusteringColumns": list(cluster_by),
                                "curve": "hilbert" if hilbert_by
                                else "zorder"},
                               separators=(",", ":"))))
            version = txn.commit(
                actions, operation="OPTIMIZE",
                operation_parameters=dict(
                    params, batch=f"{bi + 1}/{len(batches)}")
                if len(batches) > 1 else params,
                operation_metrics={"numRemovedFiles": str(len(victims)),
                                   "numAddedFiles": str(len(adds))})
            n_removed += len(victims)
            n_added += len(adds)
        return {"filesRemoved": n_removed, "filesAdded": n_added,
                "version": version}

    def reorg_purge(self) -> Dict[str, int]:
        """REORG TABLE ... APPLY (PURGE): rewrite exactly the files
        carrying deletion vectors, materializing their surviving rows
        and dropping the sidecar references; DV-free files are not
        touched. Rewrites are ``dataChange=False`` like OPTIMIZE — the
        logical table is unchanged, so change feeds skip them — and
        once the soft-deleted adds age past retention, VACUUM reclaims
        both the old data files and the now-unreferenced sidecars.

        Scale shape: read + write cost is proportional to the
        DV-carrying files only (the normal case after a row-level
        delete wave is a small fraction of the table); the survivors
        scan is the same pruned DV anti-join plan as any read, and the
        commit is one transaction that conflict-checks like any other
        writer. Returns {filesPurged, filesAdded, version}."""
        from .dv import DV_TAG
        t = self.table
        txn = t.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        victims = [f for f in snap.all_files()
                   if (f.tags or {}).get(DV_TAG)]
        if not victims:
            return {"filesPurged": 0, "filesAdded": 0,
                    "version": snap.version}
        cand_paths = {_canonical(f.path, snap.table_path)
                      for f in victims}
        subset = [r for r in snap._files_rows
                  if r["path"] in cand_paths]
        df = snap.to_df(files=subset)  # DV anti-join applied here
        adds = stage_and_collect(
            df, t.path, snap.metadata.partitionColumns,
            data_change=False,
            num_indexed_cols=_n_indexed(snap.metadata.configuration),
            bloom_cfg=_bloom(snap.metadata.configuration),
            physical_meta=snap.metadata)
        now = int(time.time() * 1000)
        actions: List[Any] = list(adds) + [
            f.remove(now, data_change=False) for f in victims]
        version = txn.commit(
            actions, operation="REORG",
            operation_parameters={"applyPurge": "true"},
            operation_metrics={"numRemovedFiles": str(len(victims)),
                               "numAddedFiles": str(len(adds))})
        return {"filesPurged": len(victims), "filesAdded": len(adds),
                "version": version}

    def restore(self, version: Optional[int] = None,
                timestamp_ms: Optional[int] = None) -> Dict[str, int]:
        """RESTORE the table to an earlier version (or the version active
        at a timestamp) as a NEW commit: the file-set diff between the
        current and target snapshots becomes add/remove actions, and the
        target's Metadata is re-committed when it differs (undoing schema
        or config changes). History is preserved -- time travel still
        reaches every version, and the restore itself is just another
        commit that conflict-checks like any other writer.

        Fails if any file the target snapshot needs has been VACUUMed.
        Returns {filesAdded, filesRemoved, version}.
        """
        t = self.table
        txn = t.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        target = t._resolve(version, timestamp_ms)
        if target.version == snap.version:
            return {"filesAdded": 0, "filesRemoved": 0,
                    "version": snap.version}
        txn.read_whole_table()

        from .dv import DV_TAG
        from .log.snapshot import addfiles_from_rows, canonical_path_col
        # The file-set diff runs as DataFrame joins on files_df (paths
        # are canonical there) — only the DIFF rows, which the commit
        # must enumerate anyway, ever reach the driver. A path present
        # in both snapshots still needs re-adding when its deletion
        # vector differs (the DV lives in tags, not the path).
        cur_k = snap.files_df.select(
            F.col("path").alias("__p"),
            F.col("tags").getItem(DV_TAG).alias("__cdv"))
        want_df = target.files_df.withColumn(
            "__wdv", F.col("tags").getItem(DV_TAG))
        add_df = (want_df
                  .join(cur_k, want_df["path"] == cur_k["__p"], "left")
                  .where(F.col("__p").isNull() |
                         ~F.col("__wdv").eqNullSafe(F.col("__cdv")))
                  .drop("__p", "__cdv", "__wdv"))
        remove_df = snap.files_df.join(target.files_df.select("path"),
                                       "path", "left_anti")
        n_add = add_df.count()
        n_remove = remove_df.count()

        root = t.path
        local_root = root[len("file:"):] if root.startswith("file:") else root
        # Existence check for every file (and DV sidecar) the target
        # needs, distributed through the store — the driver sees only
        # the missing list (the error report).
        import pandas as pd
        from .shipping import ensure_shipped_by_value
        ensure_shipped_by_value()
        store = t.log.store
        dv_needed = (target.files_df
                     .select(F.col("tags").getItem(DV_TAG).alias("__t"))
                     .where(F.col("__t").isNotNull())
                     .select(canonical_path_col("__t", snap.table_path)
                             .alias("path")))
        needed = target.files_df.select("path").unionByName(dv_needed)

        def find_missing(batches):
            for pdf in batches:
                gone = [p for p in pdf["path"]
                        if not store.exists(os.path.join(local_root, p))]
                yield pd.DataFrame({"path": gone})

        missing = [r["path"] for r in
                   needed.mapInPandas(find_missing, "path string")
                   .limit(100).collect()]
        if missing:
            raise DeltaError(
                f"cannot restore to version {target.version}: "
                f"data file(s) were removed by VACUUM "
                f"(first: {sorted(missing)[0]})")

        now = int(time.time() * 1000)
        import dataclasses

        def files_factory():
            # streamed action pass (VERDICT r10 #8): the commit JSON
            # enumerates the diff atomically, but the driver holds one
            # action at a time. Re-added files are a data change even
            # if their original commit was a dataChange=false layout
            # rewrite (OPTIMIZE).
            for r in add_df.toLocalIterator():
                yield dataclasses.replace(addfiles_from_rows([r])[0],
                                          dataChange=True)
            for r in remove_df.toLocalIterator():
                yield addfiles_from_rows([r])[0].remove(now)

        if target.metadata.schemaString != snap.metadata.schemaString \
                or target.metadata.configuration \
                != snap.metadata.configuration \
                or target.metadata.partitionColumns \
                != snap.metadata.partitionColumns:
            txn.update_metadata(target.metadata, overwrite_schema=True)
        ver = txn.commit_stream(
            [], files_factory, has_removes=n_remove > 0,
            data_change=True, operation="RESTORE",
            operation_parameters={"version": str(target.version)},
            operation_metrics={"numRestoredFiles": str(n_add),
                               "numRemovedFiles": str(n_remove)})
        return {"filesAdded": n_add, "filesRemoved": n_remove,
                "version": ver}

    def compute_stats(self) -> Dict[str, int]:
        """ANALYZE-style stats backfill: re-commit every active file
        that lacks ``stats`` with exact footer statistics attached
        (dataChange=False add replacing the stats-less add — readers
        see identical data; change feeds skip it like OPTIMIZE). Files
        written by engines that don't record Delta stats regain file
        skipping and the metadata-only aggregate fast path.

        Scale shape: the footer reads run as one mapInPandas over the
        stats-less file list (never a per-file driver loop); the driver
        collects only the action fields; commit is one transaction that
        conflict-checks like any other writer. Returns
        {filesUpdated, version} (version -1 when nothing lacked stats)."""
        import pandas as pd

        from .shipping import ensure_shipped_by_value
        from .writer import file_stats_json
        t = self.table
        spark = t.log.spark
        txn = t.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        root = t.path
        local_root = root[len("file:"):] if root.startswith("file:") else root
        missing = [f for f in snap.all_files() if not f.stats]
        if not missing:
            return {"filesUpdated": 0, "version": -1}
        ensure_shipped_by_value()

        def footer_pass(batches):
            import urllib.parse
            for pdf in batches:
                rows = []
                for rel in pdf["rel"]:
                    # AddFile.path is URL-quoted in the log (partition
                    # dirs like 'st%3DF'); decode before touching the
                    # filesystem.
                    full = os.path.join(local_root,
                                        urllib.parse.unquote(rel))
                    stats, _n = file_stats_json(full)
                    rows.append((rel, stats, os.path.getsize(full)))
                yield pd.DataFrame(rows,
                                   columns=["rel", "stats", "size"])

        from .localrel import local_rows_df
        par = min(len(missing),
                  spark.sparkContext.defaultParallelism) or 1
        stat_rows = {r["rel"]: r for r in
                     (local_rows_df(
                         spark, [(f.path,) for f in missing],
                         "rel string", parts=par)
                      .mapInPandas(footer_pass,
                                   "rel string, stats string, size long")
                      .collect())}
        import dataclasses
        now = int(time.time() * 1000)
        adds = [dataclasses.replace(
            f, stats=stat_rows[f.path]["stats"],
            size=int(stat_rows[f.path]["size"]), dataChange=False)
            for f in missing]
        # Pair each in-place re-add with a dataChange=False remove of
        # the OLD entry: replay is unaffected (same-version add beats
        # remove in the window dedup, and removes precede adds in line
        # order for the sequential folds), but the version-checksum
        # chain now folds exactly (−old size, +new size) instead of
        # inflating numFiles on every stats backfill.
        removes = [f.remove(now, data_change=False) for f in missing]
        version = txn.commit(
            removes + adds, "COMPUTE STATS",
            operation_metrics={"numFilesUpdated": str(len(adds))})
        return {"filesUpdated": len(adds), "version": version}

    def compact_log(self, start: Optional[int] = None,
                    end: Optional[int] = None) -> Dict[str, int]:
        """Minor log compaction: write ``<start>.<end>.compacted.json``
        carrying the NET actions of commits [start, end] (default: the
        whole post-checkpoint tail). Snapshot replay then reads ONE
        file instead of the range — the delta-spark log-compaction
        shape, for logs whose checkpoint interval leaves long tails.

        Semantics (what "net" keeps):
        - per path, the LAST add/remove wins; a net remove is RETAINED
          as a tombstone (vacuum still needs it);
        - the latest Metadata and Protocol of the range;
        - the latest SetTransaction per appId;
        - CommitInfo and cdc actions are dropped — they are
          per-version artifacts, and per-version consumers (history,
          CDF, streaming, time travel) keep reading the RAW delta
          files, which compaction never deletes.

        Driver cost: O(range) small file reads + O(net actions) JSON —
        the same budget as the P&M tail replay. Best-effort publish:
        two racing compactors of the same range write identical
        content, and losing the put-if-absent race is a no-op."""
        snap = self.table.snapshot()
        log = self.table.log
        if end is None:
            end = snap.version
        if start is None:
            start = (snap.segment.checkpoint_version + 1
                     if snap.segment.checkpoint_version is not None
                     else 0)
        if not 0 <= start <= end <= snap.version:
            raise ValueError(f"bad compaction range [{start}, {end}]")
        return _compact_log_range(log, snap.table_path, start, end)

    def compute_checksum(self) -> Dict[str, int]:
        """Bootstrap (or repair) the version-checksum chain: aggregate
        the CURRENT snapshot's file relation once (numFiles, total
        bytes — one Spark job, never per-commit) and publish
        ``<version>.crc``. Every later commit then extends the chain
        incrementally at zero job cost (txn._write_version_checksum).
        Use on pre-feature tables or after a chain break (a remove
        without size info)."""
        from .log import checksum as cks
        snap = self.table.snapshot()
        row = (snap.files_df
               .agg(F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum("size"), F.lit(0)).alias("bytes"))
               .first())
        from .log.actions import DomainMetadata
        crc = cks.VersionChecksum(
            tableSizeBytes=int(row["bytes"]), numFiles=int(row["n"]),
            protocol=snap.protocol, metadata=snap.metadata,
            domainMetadata=[DomainMetadata(k, v) for k, v in
                            sorted(snap.domain_metadata.items())])
        cks.write_checksum(snap.store, self.table.log.log_path,
                           snap.version, crc)
        # fresh anchor: incremental writing may resume
        self.table.log._crc_chain_broken = False
        return {"version": snap.version, "numFiles": crc.numFiles,
                "tableSizeBytes": crc.tableSizeBytes}

    def verify_checksum(self) -> Dict[str, Any]:
        """Integrity check (FSCK's log-side twin): aggregate the live
        snapshot state and compare against the writer's ``.crc``
        record at the same version. Raises DeltaError on mismatch — a
        lost delta file, truncated checkpoint or corrupted action
        surfaces loudly instead of as silently wrong aggregates.
        Returns the compared numbers when they agree (or when no
        checksum exists — nothing to verify against)."""
        from .log import checksum as cks
        snap = self.table.snapshot()
        crc = cks.read_checksum(snap.store, self.table.log.log_path,
                                snap.version)
        row = (snap.files_df
               .agg(F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum("size"), F.lit(0)).alias("bytes"))
               .first())
        out = {"version": snap.version, "checksum_present": crc is not None,
               "numFiles": int(row["n"]),
               "tableSizeBytes": int(row["bytes"])}
        if crc is None:
            return out
        problems = []
        if crc.numFiles != out["numFiles"]:
            problems.append(f"numFiles: crc={crc.numFiles} "
                            f"live={out['numFiles']}")
        if crc.tableSizeBytes != out["tableSizeBytes"]:
            problems.append(f"tableSizeBytes: crc={crc.tableSizeBytes} "
                            f"live={out['tableSizeBytes']}")
        if crc.metadataId is not None \
                and crc.metadataId != snap.metadata.id:
            problems.append(f"metadataId: crc={crc.metadataId} "
                            f"live={snap.metadata.id}")
        if crc.protocol is not None and (
                crc.protocol.minReaderVersion
                != snap.protocol.minReaderVersion
                or crc.protocol.minWriterVersion
                != snap.protocol.minWriterVersion):
            problems.append("protocol mismatch")
        if crc.domainMetadata is not None:
            # live-domain state (incl. the delta.rowTracking watermark)
            # must replay to exactly what the writer recorded
            rec = {dm.domain: dm.configuration
                   for dm in crc.domainMetadata}
            live = dict(snap.domain_metadata)
            if rec != live:
                problems.append(
                    f"domainMetadata: crc has {sorted(rec)} "
                    f"live has {sorted(live)} (or configs differ)")
        if problems:
            raise DeltaError(
                f"version checksum mismatch at v{snap.version}: "
                + "; ".join(problems))
        return out

    def fsck_repair(self, dry_run: bool = False) -> List[str]:
        """FSCK REPAIR TABLE: drop AddFile entries whose physical data
        file no longer exists (external deletion, botched restore of a
        bucket, retention mishap) so reads stop failing on the missing
        file. One commit of RemoveFiles for exactly the missing paths;
        the conflict checker treats it like any delete. Returns the
        repaired (or would-repair, under dry_run) table-relative
        paths — delta-spark's FSCK REPAIR TABLE semantics.

        Scale shape: the existence probe fans the file inventory out
        through the same distributed publish machinery as a write
        (mapInPandas over paths; the driver only collects the MISSING
        subset, normally empty or tiny)."""
        import pandas as pd
        from pyspark.sql import types as T2

        from .shipping import ensure_shipped_by_value
        t = self.table
        spark = t.log.spark
        store = t.log.store
        txn = t.log.start_transaction()
        snap = txn.snapshot
        if snap is None:
            raise FileNotFoundError("table does not exist")
        files = [(f.path,
                  canonical_path(f.path, snap.table_path))
                 for f in snap.all_files()]
        if not files:
            return []
        ensure_shipped_by_value()

        def probe(batches):
            for pdf in batches:
                missing = [(p,) for p, fs in
                           zip(pdf["path"], pdf["fs"])
                           if not store.exists(fs)]
                yield pd.DataFrame(missing or None,
                                   columns=["path"])

        from .localrel import local_rows_df
        n_parts = min(len(files),
                      spark.sparkContext.defaultParallelism) or 1
        missing = [r["path"] for r in
                   local_rows_df(spark, files, "path string, fs string",
                                 parts=n_parts)
                   .mapInPandas(probe, T2.StructType(
                       [T2.StructField("path", T2.StringType())]))
                   .collect()]
        if dry_run or not missing:
            return sorted(missing)
        by_path = {f.path: f for f in snap.all_files()}
        now = int(time.time() * 1000)
        removes = [by_path[p].remove(now) for p in missing]
        txn.commit(removes, "FSCK",
                   operation_metrics={"numRemovedFiles":
                                      str(len(removes))})
        return sorted(missing)

    def vacuum(self, retention_ms: Optional[int] = None,
               dry_run: bool = False, lite: bool = False) -> List[str]:
        """Delete data files that are neither active nor within the
        tombstone retention window (default: the table's
        delta.deletedFileRetentionDuration, 1 week —
        DeltaConfig.scala:219-225). Returns deleted (or would-delete)
        paths relative to the table root.

        ``lite=True`` (delta-spark's VACUUM LITE): derive the doomed
        set from the LOG's RemoveFile tombstones instead of listing
        the table tree — at 100 TB a full recursive listing is
        O(objects) against the object store, while the log window
        since the last LITE run is O(commits). Refuses loudly when the
        log cannot prove coverage (a delta file in the window was
        cleaned) — fall back to a full vacuum then."""
        t = self.table
        spark = t.log.spark
        store = t.log.store
        snap = t.log.update() or t.snapshot()
        # vacuumProtocolCheck (Delta protocol feature): VACUUM must run
        # the full WRITER protocol gate before deleting anything — a
        # client that can't honour the table's writer features could
        # otherwise reclaim files a feature it doesn't understand still
        # needs (the spec's motivating example: managed commits). The
        # check is unconditional here (it is cheap); the FEATURE's role
        # is forcing the same behavior on foreign clients via the
        # reader/writer version bump.
        from .log.features import assert_writable
        try:
            assert_writable(snap.protocol, t.path)
        except ValueError as e:
            raise DeltaProtocolError(f"VACUUM refused: {e}")
        if retention_ms is None:
            retention_ms = TableConfig(
                snap.metadata.configuration).tombstone_retention_ms
        horizon = int(time.time() * 1000) - retention_ms
        if lite:
            return self._vacuum_lite(snap, horizon, dry_run)
        root = t.path
        local_root = root[len("file:"):] if root.startswith("file:") else root

        # Distributed reclaim (the reference-Spark VACUUM shape): the
        # table subtree is LISTED in parallel (one task per top-level
        # child — the partition-dir fan-out), candidates anti-join the
        # active file inventory as DataFrames (never a driver-side set
        # of all files), and deletes run on executors. The driver holds
        # only the doomed list — the report the API returns.
        import pandas as pd
        from .log.snapshot import canonical_path_col
        from .shipping import ensure_shipped_by_value
        ensure_shipped_by_value()

        # every child subtree except the log itself — _change_data /
        # _deletion_vectors dirs hold reclaimable files. Concurrent
        # writers' in-flight _staging_* dirs are excluded entirely:
        # staged files are seconds old, never past the retention
        # horizon, and their publish rename would race the listing.
        seeds = [""] + [n for n in store.list_dir(local_root)
                        if n != "_delta_log" and not n.startswith(".")
                        and not n.startswith("_staging")
                        and store.is_dir(os.path.join(local_root, n))]

        def list_subtree(batches):
            def stat_or_skip(path):
                # A file can vanish between listing and stat (a
                # concurrent commit publishing/renaming staged files);
                # a vanished file is by definition not vacuumable.
                try:
                    return store.stat(path)
                except FileNotFoundError:
                    return None
            for pdf in batches:
                rels, mts = [], []
                for seed in pdf["seed"]:
                    if seed == "":
                        for n in store.list_dir(local_root):
                            full = os.path.join(local_root, n)
                            if n.startswith(("_", ".")) or store.is_dir(full):
                                continue
                            st = stat_or_skip(full)
                            if st is None:
                                continue
                            rels.append(n)
                            mts.append(st[1])
                    else:
                        base = os.path.join(local_root, seed)
                        for rel in store.list_files_recursive(base):
                            if os.path.basename(rel).startswith(("_", ".")):
                                continue
                            st = stat_or_skip(os.path.join(base, rel))
                            if st is None:
                                continue
                            rels.append(os.path.join(seed, rel))
                            mts.append(st[1])
                yield pd.DataFrame({"rel": rels, "mtime": mts})

        from .localrel import local_rows_df
        n_seed_parts = min(len(seeds),
                           spark.sparkContext.defaultParallelism) or 1
        listing = (local_rows_df(spark, [(s,) for s in seeds],
                                 "seed string", parts=n_seed_parts)
                   .mapInPandas(list_subtree, "rel string, mtime long"))

        # Protective set: active files ∪ referenced deletion-vector
        # sidecars ∪ tombstones still inside the retention window.
        # The last leg is the contract VACUUM must honour
        # (InMemoryLogReplay.scala:90-92, DeltaConfig.scala:219-225):
        # a file DELETE'd yesterday has an OLD mtime but its tombstone
        # is young — reclaiming it would strand time travel to every
        # version of the past week. Protection keys on
        # deletionTimestamp, never mtime.
        from .dv import DV_TAG
        active = snap.files_df.select(F.col("path").alias("__p"))
        dv = (snap.files_df
              .select(F.col("tags").getItem(DV_TAG).alias("__t"))
              .where(F.col("__t").isNotNull())
              .select(canonical_path_col("__t", snap.table_path)
                      .alias("__p")))
        young = snap.retained_tombstones(horizon)
        young_paths = young.select(F.col("path").alias("__p"))
        young_dv = (young
                    .select(F.col("tags").getItem(DV_TAG).alias("__t"))
                    .where(F.col("__t").isNotNull())
                    .select(canonical_path_col("__t", snap.table_path)
                            .alias("__p")))
        active = (active.unionByName(dv).unionByName(young_paths)
                  .unionByName(young_dv).distinct())

        # No broadcast hint on the anti-join: the active inventory is
        # usually tiny (→ auto-broadcast) but a forced hint would pin a
        # multi-million-file inventory in driver memory; both sides are
        # metadata-sized, so a shuffled anti-join is fine at the tail.
        cand = (listing
                .withColumn("__p", F.concat(F.lit(local_root + "/"),
                                            F.col("rel")))
                .where(F.col("mtime") <= F.lit(horizon))
                .join(active, "__p", "left_anti"))

        if dry_run:
            doomed = [r["rel"] for r in cand.select("rel").collect()]
        else:
            def delete_files(batches):
                for pdf in batches:
                    done = []
                    for rel in pdf["rel"]:
                        try:
                            store.delete(os.path.join(local_root, rel))
                        except FileNotFoundError:
                            pass      # task retry: already deleted
                        done.append(rel)
                    yield pd.DataFrame({"rel": done})

            doomed = [r["rel"] for r in
                      cand.select("rel").mapInPandas(
                          delete_files, "rel string").collect()]
            # prune now-empty partition dirs (bounded by dir count)
            for dirpath, dirs, files in os.walk(local_root, topdown=False):
                if "_delta_log" in dirpath or dirpath == local_root:
                    continue
                if not dirs and not files:
                    try:
                        os.rmdir(dirpath)
                    except OSError:
                        pass
        return sorted(doomed)

    def _vacuum_lite(self, snap, horizon: int,
                     dry_run: bool) -> List[str]:
        """Log-inventory vacuum: the doomed set is the RemoveFile
        tombstones in the commit window since the last LITE run (or
        version 0), aged past ``horizon`` and not re-added since —
        ZERO listing of the data tree. Coverage is proven before
        anything is deleted: every delta file in the window must still
        exist; a cleaned window (W8 log cleanup passed through it)
        raises instead of silently missing tombstones. Deletes run
        executor-side (mapInPandas over the candidate paths, vanished
        files skipped); a marker commit (operation VACUUM LITE END,
        lastVacuumedVersion) bounds the NEXT run's window to the new
        tail, so steady-state cost is O(commits between vacuums)
        regardless of table size."""
        import pandas as pd

        from .log import filenames as fn2
        from .log.actions import SINGLE_ACTION_SCHEMA
        from .log.snapshot import canonical_path_col
        from .shipping import ensure_shipped_by_value
        ensure_shipped_by_value()
        t = self.table
        spark = t.log.spark
        store = t.log.store
        log_path = t.log.log_path
        head = snap.version
        root = t.path
        local_root = root[len("file:"):] if root.startswith("file:") \
            else root

        marker = None
        for h in t.history():               # newest-first
            if h["operation"] == "VACUUM LITE END":
                marker = int((h["operationParameters"] or {})
                             .get("lastVacuumedVersion", h["version"]))
                break
        start = marker + 1 if marker is not None else 0
        have = sorted(fn2.delta_version(n)
                      for n in store.list_from(log_path)
                      if fn2.is_delta_file(n))
        window = [v for v in have if start <= v <= head]
        if window != list(range(start, head + 1)):
            missing = sorted(set(range(start, head + 1)) - set(window))
            raise DeltaError(
                f"VACUUM LITE cannot prove coverage: log versions "
                f"{missing[:5]}{'...' if len(missing) > 5 else ''} in "
                f"window [{start}, {head}] were cleaned; run a full "
                f"vacuum (lite=False) instead")
        if not window:
            return []

        from .dv import DV_TAG
        acts = spark.read.json(
            [fn2.delta_file(log_path, v) for v in window],
            schema=SINGLE_ACTION_SCHEMA)
        removes = (acts.where(F.col("remove.path").isNotNull())
                   .select(canonical_path_col("remove.path",
                                              snap.table_path)
                           .alias("__p"),
                           F.coalesce(F.col("remove.deletionTimestamp"),
                                      F.lit(0)).alias("__ts"),
                           F.col("remove.tags").getItem(DV_TAG)
                           .alias("__dv"),
                           F.regexp_extract(F.input_file_name(),
                                            r"(\d+)\.json$", 1)
                           .cast("long").alias("__v")))
        # Retention is decided per PATH on the YOUNGEST tombstone, not
        # per remove row: a path removed, RESTORE-re-added and removed
        # again has two tombstones, and the young one guards the file
        # for time travel even when the old one is past the horizon
        # (InMemoryLogReplay.scala:90-92 keeps latest-per-path).
        doomed_paths = (removes.groupBy("__p")
                        .agg(F.max("__ts").alias("__max_ts"))
                        .where(F.col("__max_ts") <= F.lit(horizon))
                        .select("__p"))
        # tombstoned DV sidecars ride along (same rule as full vacuum)
        dvs = (removes.join(doomed_paths, "__p", "semi")
               .where(F.col("__dv").isNotNull())
               .select(canonical_path_col("__dv", snap.table_path)
                       .alias("__p")))
        cand = doomed_paths.unionByName(dvs).distinct()
        # Protective anti-join: active files ∪ their DV sidecars ∪
        # snapshot-level in-retention tombstones (+ their sidecars).
        # The last leg is belt-and-braces vs a young tombstone living
        # OUTSIDE the window (e.g. a marker written by an engine with
        # a different advance rule).
        active = snap.files_df.select(F.col("path").alias("__p"))
        adv = (snap.files_df
               .select(F.col("tags").getItem(DV_TAG).alias("__t"))
               .where(F.col("__t").isNotNull())
               .select(canonical_path_col("__t", snap.table_path)
                       .alias("__p")))
        young = snap.retained_tombstones(horizon)
        young_paths = young.select(F.col("path").alias("__p"))
        young_dv = (young
                    .select(F.col("tags").getItem(DV_TAG).alias("__t"))
                    .where(F.col("__t").isNotNull())
                    .select(canonical_path_col("__t", snap.table_path)
                            .alias("__p")))
        protect = (active.unionByName(adv).unionByName(young_paths)
                   .unionByName(young_dv).distinct())
        cand = cand.join(protect, "__p", "left_anti")
        # Marker advance: a version whose tombstones are all past the
        # horizon is fully handled; the FIRST version still carrying an
        # in-retention tombstone (and everything after it) must stay in
        # the NEXT run's window, or those files would never be
        # reclaimable by a lite run once they age out.
        skipped = (removes.where(F.col("__ts") > F.lit(horizon))
                   .agg(F.min("__v")).collect()[0][0])
        vacuumed_through = head if skipped is None else int(skipped) - 1
        prefix = local_root.rstrip("/") + "/"
        cand = (cand.where(F.col("__p").startswith(prefix))
                .select(F.expr(
                    f"substring(__p, {len(prefix) + 1})").alias("rel")))

        if dry_run:
            # windows can overlap (the marker only advances past fully
            # aged-out versions) — report only files that still exist
            def exists_filter(batches):
                for pdf in batches:
                    keep = [rel for rel in pdf["rel"]
                            if store.exists(os.path.join(local_root,
                                                         rel))]
                    yield pd.DataFrame({"rel": keep})
            return sorted(r["rel"] for r in
                          cand.mapInPandas(exists_filter,
                                           "rel string").collect())

        def delete_files(batches):
            for pdf in batches:
                done = []
                for rel in pdf["rel"]:
                    try:
                        store.delete(os.path.join(local_root, rel))
                    except FileNotFoundError:
                        continue      # already reclaimed / task retry
                    done.append(rel)
                yield pd.DataFrame({"rel": done})

        doomed = sorted(r["rel"] for r in
                        cand.mapInPandas(delete_files,
                                         "rel string").collect())
        txn = t.log.start_transaction()
        txn.commit([], "VACUUM LITE END",
                   {"lastVacuumedVersion": str(vacuumed_through),
                    "retentionCheckEnabled": "true",
                    "numDeletedFiles": str(len(doomed))})
        return doomed

    def generate_manifest(self) -> List[str]:
        """Write a ``_symlink_format_manifest`` for the current
        snapshot — the interop path that lets manifest-based engines
        (Presto, Trino, Athena, Redshift Spectrum) query the table by
        reading a plain list of active Parquet files, the same
        engine-without-a-connector role the reference's Power BI reader
        plays (powerbi/fn_ReadDeltaTable.pq:9-10: re-derive the active
        file list outside the JVM).

        Layout mirrors Delta's GENERATE symlink_format_manifest: one
        ``manifest`` text file per partition directory (or a single
        root-level one for unpartitioned tables), each line an absolute
        ``file:`` URI of an active data file. Returns the manifest
        paths written. Stale manifest subdirectories from dropped
        partitions are removed.

        Scale: the grouping runs on ``files_df`` (one shuffle keyed by
        the physical directory — the partition fan-out) and each
        executor task writes its directories' manifest files through
        the LogStore; the driver collects only the written paths
        (bounded by partition count, the inherent report size).
        """
        t = self.table
        spark = t.log.spark
        store = t.log.store
        snap = t.log.update() or t.snapshot()
        root = t.path
        local_root = root[len("file:"):] if root.startswith("file:") else root
        man_root = os.path.join(local_root, "_symlink_format_manifest")
        store.remove_tree(man_root)

        import pandas as pd
        from .shipping import ensure_shipped_by_value
        ensure_shipped_by_value()

        prefix = local_root.rstrip("/") + "/"
        # group by the file's PHYSICAL directory so the manifest tree
        # mirrors the on-disk partition layout even for escaped
        # partition values; files outside the table root (absolute-path
        # adds) land in the root manifest
        rel = F.when(F.col("path").startswith(prefix),
                     F.expr(f"substring(path, {len(prefix) + 1})"))
        sub = F.when(rel.isNull() | ~rel.contains("/"), F.lit("")) \
            .otherwise(F.regexp_replace(rel, "/[^/]*$", ""))
        grouped = (snap.files_df
                   .select(sub.alias("__sub"),
                           F.concat(F.lit("file:"), F.col("path"))
                           .alias("__uri"))
                   .groupBy("__sub")
                   .agg(F.sort_array(F.collect_list("__uri"))
                        .alias("__uris")))

        def write_manifests(batches):
            for pdf in batches:
                out = []
                for s, uris in zip(pdf["__sub"], pdf["__uris"]):
                    d = os.path.join(man_root, s) if s else man_root
                    path = os.path.join(d, "manifest")
                    os.makedirs(d, exist_ok=True)
                    store.write(path, list(uris), overwrite=True)
                    out.append(path)
                yield pd.DataFrame({"path": out})

        written = [r["path"] for r in
                   grouped.mapInPandas(write_manifests,
                                       "path string").collect()]
        return sorted(written)
