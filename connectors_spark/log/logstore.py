"""LogStore: atomic, mutual-exclusion single-file writes + ordered listing.

Re-expresses the reference's storage layer
(``standalone/src/main/scala/io/delta/standalone/internal/storage/``:
``HadoopFileSystemLogStore.scala:37-63``, ``HDFSLogStore.scala:35-55``,
``S3SingleDriverLogStore.scala:32-60``) for the engine's commit protocol.

The one primitive everything rests on is **put-if-absent**: writing commit
``N.json`` must fail if another writer already created it. On POSIX
filesystems we get this from ``os.link`` (hard-link a fully-written temp
file to the final name -- atomic and exclusive). Object stores without a
rename/link primitive need a conditional-put; like the reference's
S3SingleDriverLogStore, a v1 deployment there declares single-writer.

This is engine infrastructure (driver-side), not a Spark job.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Iterable, List


class FileAlreadyExistsError(FileExistsError):
    """Raised when put-if-absent loses the race (another committer won)."""


class LogStore:
    """Local/POSIX log store. Subclass per scheme (HDFS/S3/...) as needed."""

    def read(self, path: str) -> List[str]:
        with open(path, "r", encoding="utf-8") as f:
            return [line.rstrip("\n") for line in f if line.strip()]

    def write(self, path: str, lines: Iterable[str], overwrite: bool = False) -> None:
        """Atomically write ``lines`` to ``path``.

        overwrite=False -> put-if-absent (HadoopFileSystemLogStore.scala:37-63
        semantics): raise FileAlreadyExistsError if ``path`` exists.
        """
        parent = os.path.dirname(path)
        os.makedirs(parent, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=parent, prefix=".tmp_", suffix=".json")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                for line in lines:
                    f.write(line)
                    f.write("\n")
                f.flush()
                os.fsync(f.fileno())
            if overwrite:
                os.replace(tmp, path)  # atomic on POSIX
                tmp = None
            else:
                try:
                    os.link(tmp, path)  # atomic create-exclusive
                except FileExistsError as e:
                    raise FileAlreadyExistsError(path) from e
        finally:
            if tmp is not None and os.path.exists(tmp):
                os.unlink(tmp)

    def list_from(self, dir_path: str, start_name: str = "") -> List[str]:
        """Names in ``dir_path`` >= ``start_name``, lexically sorted
        (ordered listing contract of the reference log stores)."""
        if not os.path.isdir(dir_path):
            return []
        return sorted(n for n in os.listdir(dir_path)
                      if n >= start_name and not n.startswith(".tmp_"))

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def mtime_ms(self, path: str) -> int:
        return int(os.stat(path).st_mtime * 1000)


def default_log_store(path: str) -> LogStore:
    """Scheme-based dispatch (DelegatingLogStore.scala). v1: local POSIX only;
    hdfs/s3 paths would select rename- or conditional-put-based stores."""
    if "://" in path and not path.startswith("file:"):
        raise NotImplementedError(
            f"no LogStore for scheme of {path!r}; v1 supports local/file paths")
    return LogStore()


def strip_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):] or "/"
    if path.startswith("file:"):
        return path[len("file:"):]
    return path
