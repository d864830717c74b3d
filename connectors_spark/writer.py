"""Data-file writer: stage Parquet with Spark, publish via the commit
protocol.

The distributed write is plain ``df.write.partitionBy(...).parquet`` into a
hidden staging directory under the table root (so a publish is a same-
filesystem rename, never a copy); the driver then moves each part file into
place and builds ``AddFile`` actions with per-file stats
(numRecords/min/max/nullCount from the Parquet footers -- the skipping
input the reference carries opaquely in ``AddFile.stats``,
actions.scala:116-117). Mirrors the reference's writer+commit split
(Flink ``DeltaWriter``/``DeltaWriterBucket`` stage files,
``DeltaGlobalCommitter`` commits; DeltaWriterBucket.java, S8).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import urllib.parse
import uuid
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame

from .log.actions import AddCDCFile, AddFile

CDC_DIR = "_change_data"
CHANGE_TYPE_COL = "_change_type"

_STATS_TYPES = ("int8", "int16", "int32", "int64", "float", "double",
                "string", "date32", "date64")


def _json_safe(v: Any) -> Any:
    if isinstance(v, bytes):
        return None
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return v
    return v


def file_stats_json(path: str) -> Tuple[str, int]:
    """(stats json, numRecords) from the Parquet footer. Driver-side here;
    at fleet scale the same footer read runs as a ``mapInPandas`` over the
    staged file list."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    num_rows = md.num_rows
    mins: Dict[str, Any] = {}
    maxs: Dict[str, Any] = {}
    nulls: Dict[str, int] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name:  # nested: skip (top-level columns only)
                continue
            st = c.statistics
            if st is None:
                continue
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if not st.has_min_max:
                continue
            try:
                mn, mx = _json_safe(st.min), _json_safe(st.max)
            except Exception:
                # pyarrow can't extract min/max for some logical types
                # (e.g. decimal) — stats are best-effort skip hints.
                continue
            if mn is None or mx is None:
                continue
            if name not in mins or mn < mins[name]:
                mins[name] = mn
            if name not in maxs or mx > maxs[name]:
                maxs[name] = mx
    stats = {"numRecords": num_rows, "minValues": mins, "maxValues": maxs,
             "nullCount": nulls}
    return json.dumps(stats, separators=(",", ":")), num_rows


def _parse_partition_dirs(rel_dir: str, partition_columns: List[str]
                          ) -> Dict[str, Optional[str]]:
    """Decode ``col=value`` staging dirs back to exact partition values.
    This is the ONE place dir names are parsed -- for files we just wrote
    with Spark, whose escaping we then invert; readers always trust
    ``partitionValues`` (DeltaInputFormat.scala:41-43)."""
    values: Dict[str, Optional[str]] = {}
    segs = [s for s in rel_dir.split("/") if s]
    for col, seg in zip(partition_columns, segs):
        k, _, v = seg.partition("=")
        assert k == col, f"unexpected staging layout {rel_dir!r}"
        decoded = urllib.parse.unquote(v)
        values[col] = None if decoded == "__HIVE_DEFAULT_PARTITION__" else decoded
    return values


def stage_and_collect(df: DataFrame, table_path: str,
                      partition_by: Optional[List[str]] = None,
                      data_change: bool = True,
                      collect_stats: bool = True) -> List[AddFile]:
    """Write ``df`` as Parquet under ``table_path`` and return the AddFile
    actions to commit. Files land in their final Hive-style layout."""
    partition_by = partition_by or []
    staging = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    adds: List[AddFile] = []
    try:
        for root, _dirs, files in os.walk(staging):
            for name in files:
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(root, name)
                rel_dir = os.path.relpath(root, staging)
                rel_dir = "" if rel_dir == "." else rel_dir
                pv = _parse_partition_dirs(rel_dir, partition_by)
                dest_dir = os.path.join(table_path, rel_dir) if rel_dir \
                    else table_path
                os.makedirs(dest_dir, exist_ok=True)
                dest = os.path.join(dest_dir, name)
                stats = None
                if collect_stats:
                    stats, _n = file_stats_json(src)
                os.rename(src, dest)
                st = os.stat(dest)
                rel_path = os.path.join(rel_dir, name) if rel_dir else name
                adds.append(AddFile(
                    path="/".join(urllib.parse.quote(s)
                                  for s in rel_path.split("/")),
                    partitionValues=pv,
                    size=st.st_size,
                    modificationTime=int(st.st_mtime * 1000),
                    dataChange=data_change,
                    stats=stats))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return adds


def stage_cdc_and_collect(df: DataFrame, table_path: str) -> List[AddCDCFile]:
    """Write change rows (``df`` must carry a ``_change_type`` column) as
    Parquet under ``<table>/_change_data/`` and return the ``AddCDCFile``
    actions to commit alongside the DML's add/remove actions.

    CDC files are invisible to snapshot reads (SnapshotImpl ignores the
    ``cdc`` action; actions.scala:164-172) -- only the row-level change
    reader (streaming/cdf.py) opens them. Files are written unpartitioned
    with partition columns as ordinary data columns: change batches are
    small relative to the table and a per-version scan never prunes them.
    """
    staging = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    dest_dir = os.path.join(table_path, CDC_DIR)
    os.makedirs(dest_dir, exist_ok=True)
    cdcs: List[AddCDCFile] = []
    try:
        for name in os.listdir(staging):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(staging, name)
            dest = os.path.join(dest_dir, f"cdc-{uuid.uuid4().hex}-{name}")
            os.rename(src, dest)
            st = os.stat(dest)
            rel = os.path.relpath(dest, table_path)
            cdcs.append(AddCDCFile(
                path="/".join(urllib.parse.quote(s) for s in rel.split("/")),
                partitionValues={}, size=st.st_size))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return cdcs
