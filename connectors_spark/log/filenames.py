"""Delta log file-name math (reference: util/FileNames.scala:30-107).

Version <-> zero-padded filename conversions, checkpoint naming (single and
multi-part), and classification of ``_delta_log`` directory entries.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

DELTA_FILE_RE = re.compile(r"^(\d{20})\.json$")
CHECKPOINT_RE = re.compile(
    r"^(\d{20})\.checkpoint(?:\.(\d{10})\.(\d{10}))?\.parquet$")
# V2 (uuid-named) checkpoints — Delta protocol 'V2 Checkpoint Table
# Feature': <version>.checkpoint.<uuid>.parquet is a MANIFEST whose
# add/remove state lives in sidecar files under _delta_log/_sidecars/.
CHECKPOINT_V2_RE = re.compile(
    r"^(\d{20})\.checkpoint\.([0-9a-fA-F-]{32,36})\.parquet$")

LAST_CHECKPOINT = "_last_checkpoint"
SIDECAR_DIR = "_sidecars"


def delta_file(log_path: str, version: int) -> str:
    """``%020d.json`` (FileNames.scala:30)."""
    return os.path.join(log_path, "%020d.json" % version)


def checkpoint_file_single(log_path: str, version: int) -> str:
    """``%020d.checkpoint.parquet`` (FileNames.scala:49)."""
    return os.path.join(log_path, "%020d.checkpoint.parquet" % version)


def checkpoint_file_parts(log_path: str, version: int, parts: int) -> List[str]:
    """Multi-part ``%020d.checkpoint.%010d.%010d.parquet`` (FileNames.scala:61-64)."""
    return [
        os.path.join(log_path, "%020d.checkpoint.%010d.%010d.parquet"
                     % (version, i + 1, parts))
        for i in range(parts)
    ]


def checkpoint_file_v2(log_path: str, version: int, uuid_hex: str) -> str:
    """``%020d.checkpoint.<uuid>.parquet`` — the v2 manifest."""
    return os.path.join(log_path,
                        "%020d.checkpoint.%s.parquet" % (version,
                                                         uuid_hex))


def sidecar_file(log_path: str, name: str) -> str:
    """Resolve a SidecarFile action's name under _delta_log/_sidecars/
    (the spec stores sidecar paths relative to that directory)."""
    return os.path.join(log_path, SIDECAR_DIR, name)


def is_v2_checkpoint_file(name: str) -> bool:
    return CHECKPOINT_V2_RE.match(os.path.basename(name)) is not None


def is_delta_file(name: str) -> bool:
    return DELTA_FILE_RE.match(os.path.basename(name)) is not None


def is_checkpoint_file(name: str) -> bool:
    base = os.path.basename(name)
    return CHECKPOINT_RE.match(base) is not None \
        or CHECKPOINT_V2_RE.match(base) is not None


def delta_version(name: str) -> int:
    m = DELTA_FILE_RE.match(os.path.basename(name))
    if not m:
        raise ValueError(f"not a delta file: {name}")
    return int(m.group(1))


def checkpoint_version(name: str) -> int:
    base = os.path.basename(name)
    m = CHECKPOINT_RE.match(base) or CHECKPOINT_V2_RE.match(base)
    if not m:
        raise ValueError(f"not a checkpoint file: {name}")
    return int(m.group(1))


def checkpoint_part(name: str) -> Tuple[int, Optional[int], Optional[int]]:
    """Return (version, part_no, num_parts); part fields None if
    single-part or a v2 manifest (a v2 manifest is complete by itself)."""
    base = os.path.basename(name)
    m2 = CHECKPOINT_V2_RE.match(base)
    if m2:
        return int(m2.group(1)), None, None
    m = CHECKPOINT_RE.match(base)
    if not m:
        raise ValueError(f"not a checkpoint file: {name}")
    v = int(m.group(1))
    if m.group(2) is None:
        return v, None, None
    return v, int(m.group(2)), int(m.group(3))


COMPACTED_RE = re.compile(r"^(\d{20})\.(\d{20})\.compacted\.json$")


def compacted_file(log_path: str, start: int, end: int) -> str:
    """``%020d.%020d.compacted.json`` — minor log compaction (the
    delta-spark log-compaction file shape): one file carrying the NET
    actions of commits [start, end], readable in place of that delta
    range during replay. Raw deltas are never deleted by compaction,
    so per-version access (time travel, CDF, streaming) is untouched."""
    return os.path.join(log_path, "%020d.%020d.compacted.json"
                        % (start, end))


def is_compacted_file(name: str) -> bool:
    return COMPACTED_RE.match(os.path.basename(name)) is not None


def compacted_range(name: str) -> Tuple[int, int]:
    m = COMPACTED_RE.match(os.path.basename(name))
    if not m:
        raise ValueError(f"not a compacted file: {name}")
    return int(m.group(1)), int(m.group(2))
