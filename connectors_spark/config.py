"""Table configuration registry (reference: DeltaConfig.scala:78-90,199-253).

Keys live in ``Metadata.configuration``; values are strings. Interval values
use the SQL calendar-interval surface syntax ("interval 30 days").
"""

from __future__ import annotations

import re
from datetime import timedelta
from typing import Dict

_INTERVAL_RE = re.compile(
    r"^(?:interval\s+)?(\d+)\s*(millisecond|second|minute|hour|day|week)s?$",
    re.IGNORECASE)

_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 7 * 86_400_000,
}


def parse_interval_ms(s: str) -> int:
    """Parse "interval 2 weeks" -> milliseconds
    (DeltaConfigs.parseCalendarInterval, DeltaConfig.scala:78-90)."""
    m = _INTERVAL_RE.match(s.strip())
    if not m:
        raise ValueError(f"cannot parse interval: {s!r}")
    return int(m.group(1)) * _UNIT_MS[m.group(2).lower()]


DEFAULTS: Dict[str, str] = {
    # DeltaConfig.scala:199-205
    "delta.logRetentionDuration": "interval 30 days",
    # DeltaConfig.scala:219-225
    "delta.deletedFileRetentionDuration": "interval 1 weeks",
    # DeltaConfig.scala:228-233
    "delta.checkpointInterval": "10",
    "delta.appendOnly": "false",
    "delta.enableExpiredLogCleanup": "true",
    "delta.enableChangeDataFeed": "false",
    # Post-commit small-file compaction (delta-spark's
    # delta.autoOptimize.autoCompact table property; min-file knob
    # mirrors spark.databricks.delta.autoCompact.minNumFiles).
    "delta.autoOptimize.autoCompact": "false",
    "connectors.autoCompact.minNumFiles": "8",
    "connectors.autoCompact.targetFileSize": str(128 * 1024 * 1024),
    # Checkpoint policy (Delta protocol 'V2 Checkpoint Table Feature'):
    # "classic" writes <v>.checkpoint.parquet (single or multi-part);
    # "v2" writes a uuid-named MANIFEST whose add/remove state lives in
    # sidecar parquets under _delta_log/_sidecars/ — the manifest stays
    # O(sidecars) rows however many files the table has.
    "delta.checkpointPolicy": "classic",
    # Type widening (Delta protocol 'Type Widening', opt-in): ALTER
    # COLUMN TYPE to a wider type (byte<short<int<long, float->double,
    # decimal precision growth at equal scale) without rewriting data —
    # old files keep the narrow physical type; the parquet reader
    # promotes at scan time.
    "delta.enableTypeWidening": "false",
    # Row tracking (Delta protocol 'Row Tracking', opt-in): every
    # committed AddFile gets a baseRowId from the delta.rowTracking
    # high-watermark domain; fresh row id of row i = baseRowId + i.
    # Stable under appends and DV deletes; rewrites (OPTIMIZE)
    # materialize row ids into the written files to stay stable.
    "delta.enableRowTracking": "false",
    # Post-commit MINOR LOG compaction (opt-in): when the raw
    # post-checkpoint delta tail (past any existing compacted range)
    # reaches minCommits, publish a <s>.<e>.compacted.json best-effort.
    # Fixed-width adjacent ranges keep steady-state commit cost O(N)
    # every N commits (amortized O(1)); replay then reads checkpoint +
    # a few compacted files + <N raw deltas. For tables whose
    # checkpointInterval is raised or whose store is checkpoint-averse.
    "delta.autoOptimize.autoCompactLog": "false",
    "connectors.autoCompactLog.minCommits": "20",
    # DeltaConfig DATA_SKIPPING_NUM_INDEXED_COLS (delta-spark default
    # 32): per-file min/max/nullCount are recorded only for the first
    # N schema columns — the log-size lever for wide tables at scale.
    # -1 = index every column.
    "delta.dataSkippingNumIndexedCols": "32",
    # In-commit timestamps (delta-spark ICT table feature): commit
    # time lives in CommitInfo, not file mtimes.
    "delta.enableInCommitTimestamps": "false",
    # Opt-in (engine extension, log/features.py): bump the Protocol
    # action to the Delta-spec versions whenever the table state
    # requires a feature beyond the reference's (1,2) floor, so
    # foreign legacy readers refuse loudly instead of misreading
    # (physical names, resurrected DV-deleted rows). Default keeps
    # reference parity.
    "delta.protocol.autoUpgrade": "false",
}


class TableConfig:
    def __init__(self, configuration: Dict[str, str]):
        self._conf = dict(DEFAULTS)
        self._conf.update(configuration or {})

    def get(self, key: str) -> str:
        return self._conf[key]

    @property
    def checkpoint_interval(self) -> int:
        return int(self.get("delta.checkpointInterval"))

    @property
    def log_retention_ms(self) -> int:
        return parse_interval_ms(self.get("delta.logRetentionDuration"))

    @property
    def tombstone_retention_ms(self) -> int:
        return parse_interval_ms(self.get("delta.deletedFileRetentionDuration"))

    @property
    def append_only(self) -> bool:
        return self.get("delta.appendOnly").lower() == "true"

    @property
    def enable_expired_log_cleanup(self) -> bool:
        return self.get("delta.enableExpiredLogCleanup").lower() == "true"

    @property
    def enable_in_commit_timestamps(self) -> bool:
        return self.get("delta.enableInCommitTimestamps").lower() == "true"

    @property
    def protocol_auto_upgrade(self) -> bool:
        return self.get("delta.protocol.autoUpgrade").lower() == "true"

    @property
    def enable_change_data_feed(self) -> bool:
        return self.get("delta.enableChangeDataFeed").lower() == "true"

    @property
    def data_skipping_num_indexed_cols(self) -> int:
        return int(self.get("delta.dataSkippingNumIndexedCols"))

    @property
    def auto_compact(self) -> bool:
        return self.get("delta.autoOptimize.autoCompact").lower() == "true"

    @property
    def auto_compact_min_files(self) -> int:
        return int(self.get("connectors.autoCompact.minNumFiles"))

    @property
    def checkpoint_policy(self) -> str:
        return self.get("delta.checkpointPolicy").lower()

    @property
    def enable_type_widening(self) -> bool:
        return self.get("delta.enableTypeWidening").lower() == "true"

    @property
    def enable_row_tracking(self) -> bool:
        return self.get("delta.enableRowTracking").lower() == "true"

    @property
    def auto_compact_log(self) -> bool:
        return self.get("delta.autoOptimize.autoCompactLog") \
            .lower() == "true"

    @property
    def auto_compact_log_min_commits(self) -> int:
        return int(self.get("connectors.autoCompactLog.minCommits"))

    @property
    def auto_compact_target_size(self) -> int:
        return int(self.get("connectors.autoCompact.targetFileSize"))

    @property
    def check_constraints(self) -> Dict[str, str]:
        """CHECK constraints: ``delta.constraints.<name> -> <sql expr>``
        entries in the table configuration (the Delta table-property
        convention for constraint storage)."""
        pfx = "delta.constraints."
        return {k[len(pfx):]: v for k, v in self._conf.items()
                if k.startswith(pfx)}

    def as_timedelta(self, key: str) -> timedelta:
        return timedelta(milliseconds=parse_interval_ms(self.get(key)))
