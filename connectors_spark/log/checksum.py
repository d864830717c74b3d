"""Per-version checksum (.crc) files — table-state integrity records.

The Delta log layout reserves a third file type next to deltas and
checkpoints: ``<version>.crc`` (the reference's file parser names it
explicitly — "checkpoint, checksum or delta file",
FileNames.scala:78-81 — but the standalone reference never writes it).
delta-spark writes a VersionChecksum after each commit: the table's
aggregate state (total bytes, file count, protocol, metadata id) at
that version, computed INCREMENTALLY from the previous checksum plus
the commit's actions. A reader can then cross-check its reconstructed
state against the writer's record — log corruption (a lost delta file,
a truncated checkpoint, a hand-edited action) surfaces as a loud
mismatch instead of silently wrong aggregates.

Engine rules:

- Written best-effort AFTER the commit succeeds: a checksum write
  failure never fails the commit (it's an integrity record, not part
  of the atomic state — same stance as delta-spark).
- Incremental-only on the hot path: version N's checksum derives from
  version N-1's checksum + the commit's adds/removes, O(actions) on
  the driver with ZERO Spark jobs. When the chain is broken (no
  previous .crc — pre-feature tables, or a remove without size info)
  the engine SKIPS writing rather than launching an aggregate job
  inside the commit path; `TableMaintenance.compute_checksum()`
  bootstraps the chain with one explicit aggregation.
- Verified on demand (`TableMaintenance.verify_checksum()`), not per
  read: verification aggregates the live snapshot (one Spark job) and
  compares — FSCK's integrity twin.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, List, Optional

from .actions import (AddFile, DomainMetadata, Metadata, Protocol,
                      RemoveFile)
from . import filenames as fn


def checksum_file(log_path: str, version: int) -> str:
    return os.path.join(log_path, f"{version:020d}.crc")


def is_checksum_file(name: str) -> bool:
    base = os.path.basename(name)
    return base.endswith(".crc") and base[:-4].isdigit()


def checksum_version(name: str) -> int:
    return int(os.path.basename(name)[:-4])


@dataclass
class VersionChecksum:
    """The delta-spark VersionChecksum field set (Checksum.scala):
    ``tableSizeBytes``, ``numFiles``, ``numMetadata``, ``numProtocol``,
    the full ``metadata`` action and the ``protocol`` — so a delta-spark
    reader with checksum verification enabled parses and verifies these
    records as-is. ``metadataId`` is derived, kept for engine callers
    (and accepted on read for .crc files written by older rounds)."""

    tableSizeBytes: int
    numFiles: int
    protocol: Optional[Protocol] = None
    metadata: Optional[Metadata] = None
    _legacy_metadata_id: Optional[str] = None
    # Live (non-removed) domain-metadata state at this version, sorted
    # by domain — the delta-spark checksum carries the same list, which
    # also pins rowIdHighWaterMark (it lives in the delta.rowTracking
    # domain). None = unknown (legacy .crc predecessor); the chain
    # re-enriches at the next compute_checksum().
    domainMetadata: Optional[List[DomainMetadata]] = None

    @property
    def metadataId(self) -> Optional[str]:
        if self.metadata is not None:
            return self.metadata.id
        return self._legacy_metadata_id

    def to_json(self) -> str:
        d: dict = {"tableSizeBytes": int(self.tableSizeBytes),
                   "numFiles": int(self.numFiles),
                   "numMetadata": 1, "numProtocol": 1}
        if self.protocol is not None:
            d["protocol"] = self.protocol.wrap()["protocol"]
        if self.metadata is not None:
            d["metadata"] = self.metadata.wrap()["metaData"]
        if self.domainMetadata is not None:
            d["domainMetadata"] = [
                dm.wrap()["domainMetadata"]
                for dm in sorted(self.domainMetadata,
                                 key=lambda x: x.domain)]
        return json.dumps(d, separators=(",", ":"))

    @classmethod
    def from_json(cls, s: str) -> "VersionChecksum":
        d = json.loads(s)
        p = d.get("protocol")
        proto = Protocol(
            p["minReaderVersion"], p["minWriterVersion"],
            readerFeatures=p.get("readerFeatures"),
            writerFeatures=p.get("writerFeatures")) if p else None
        meta = None
        if d.get("metadata") is not None:
            from .actions import from_json_line
            meta = from_json_line(
                json.dumps({"metaData": d["metadata"]}))
        dms = d.get("domainMetadata")
        dom = ([DomainMetadata(x["domain"], x.get("configuration") or "",
                               bool(x.get("removed", False)))
                for x in dms] if dms is not None else None)
        return cls(tableSizeBytes=int(d["tableSizeBytes"]),
                   numFiles=int(d["numFiles"]),
                   protocol=proto, metadata=meta,
                   _legacy_metadata_id=d.get("metadataId"),
                   domainMetadata=dom)


def read_checksum(store, log_path: str,
                  version: int) -> Optional[VersionChecksum]:
    try:
        lines = store.read(checksum_file(log_path, version))
    except FileNotFoundError:
        return None
    try:
        return VersionChecksum.from_json("".join(lines))
    except (ValueError, KeyError):
        return None  # malformed — treat as absent, chain re-bootstraps


def incremental_checksum(prev: Optional[VersionChecksum],
                         actions: List[Any],
                         is_first_commit: bool,
                         prev_protocol: Optional[Protocol],
                         prev_metadata: Optional[Metadata]
                         ) -> Optional[VersionChecksum]:
    """Next version's checksum from the previous one + this commit's
    actions, or None when the chain can't continue exactly (no
    previous record on a non-first commit; a remove without a size).
    A DV-carrying rewrite is fine: adds/removes both carry sizes."""
    if prev is None and not is_first_commit:
        return None
    size = prev.tableSizeBytes if prev else 0
    n = prev.numFiles if prev else 0
    proto = prev.protocol if prev else prev_protocol
    meta = prev.metadata if prev else prev_metadata
    # domain state folds like the rest: upsert / tombstone per action.
    # A legacy predecessor without the field stays unknown (None) —
    # folding onto an unknown base would record a lie.
    if prev is not None:
        dom = ({dm.domain: dm for dm in prev.domainMetadata}
               if prev.domainMetadata is not None else None)
    else:
        dom = {}
    for a in actions:
        if isinstance(a, AddFile):
            size += int(a.size or 0)
            n += 1
        elif isinstance(a, RemoveFile):
            if a.size is None:
                return None  # can't decrement exactly — break chain
            size -= int(a.size)
            n -= 1
        elif isinstance(a, Protocol):
            proto = a
        elif isinstance(a, Metadata):
            meta = a
        elif isinstance(a, DomainMetadata) and dom is not None:
            if a.removed:
                dom.pop(a.domain, None)
            else:
                dom[a.domain] = a
    if n < 0 or size < 0:
        return None  # inconsistent inputs — never record a lie
    return VersionChecksum(
        tableSizeBytes=size, numFiles=n, protocol=proto, metadata=meta,
        # a legacy (metadataId-only) predecessor still pins the id until
        # a Metadata action or compute_checksum() re-enriches the chain
        _legacy_metadata_id=(prev.metadataId
                             if meta is None and prev is not None
                             else None),
        domainMetadata=(sorted(dom.values(), key=lambda x: x.domain)
                        if dom is not None else None))


_RECONSTRUCT_MAX_WALK = 64


def reconstruct_checksum(store, log_path: str, version: int,
                         max_walk: Optional[int] = None
                         ) -> Optional[VersionChecksum]:
    """Self-healing chain: rebuild the checksum at ``version`` by
    walking BACK to the nearest anchor (an existing .crc, or version 0
    whose first commit is the complete state) and folding the
    intervening commits' actions forward. Bounded at
    _RECONSTRUCT_MAX_WALK small driver-side file reads — the gap is
    normally 0-1 (a racing writer that read the predecessor's record
    before the winner published it). Returns None when no anchor is
    reachable or a fold step breaks (unsized remove, missing file)."""
    from .actions import from_json_line
    if version < 0:
        return None
    anchor = read_checksum(store, log_path, version)
    if anchor is not None:
        return anchor
    pending: List[List[Any]] = []  # action lists, newest first
    v = version
    for _ in range(max_walk if max_walk is not None
                   else _RECONSTRUCT_MAX_WALK):
        try:
            lines = store.read(fn.delta_file(log_path, v))
        except FileNotFoundError:
            return None
        acts = [a for a in (from_json_line(ln) for ln in lines)
                if a is not None]
        pending.append(acts)
        if v == 0:
            # fold from the empty table — whose domain state is KNOWN
            # empty, not unknown: anchoring with domainMetadata=None
            # would mark every chain rebuilt from genesis as
            # domain-unverifiable and silently skip the check
            anchor = VersionChecksum(0, 0, domainMetadata=[])
            break
        anchor = read_checksum(store, log_path, v - 1)
        if anchor is not None:
            break
        v -= 1
    if anchor is None:
        return None
    crc: Optional[VersionChecksum] = anchor
    for acts in reversed(pending):
        crc = incremental_checksum(crc, acts, False, None, None)
        if crc is None:
            return None
    return crc


def write_checksum(store, log_path: str, version: int,
                   crc: VersionChecksum) -> None:
    """Best-effort publish; .crc files are advisory so overwrite is
    allowed (a racing writer of the SAME version writes identical
    content — the state at a version is unique)."""
    try:
        store.write(checksum_file(log_path, version),
                    [crc.to_json()], overwrite=True)
    except Exception:  # noqa: BLE001 — never fail the commit path
        pass
