"""Checkpoint writing (reference: Checkpoints.writeCheckpoint,
``Checkpoints.scala:221-312``; multi-part naming FileNames.scala:61-64).

A checkpoint is the full snapshot state as SingleAction-shaped Parquet:
all active AddFiles (paths re-relativized), retained RemoveFile tombstones,
latest Protocol + Metadata, and the last SetTransaction per appId. The
state rows are produced DISTRIBUTED (from ``snapshot.files_df``) and the
output can be split into N parts for tables whose state no longer fits one
file -- readers glob the parts back together (segment._complete_checkpoints).

Spark can't name its output files, so parts are written to a temp dir and
renamed into the checkpoint name(s) -- the same temp-file+rename dance the
reference does for stores with visible partial writes
(Checkpoints.scala:267-288).
"""

from __future__ import annotations

import math
import os
import urllib.parse
import uuid
from typing import Optional

from pyspark.sql import functions as F

from . import filenames as fn
from .actions import SINGLE_ACTION_SCHEMA, to_json_line, Protocol, Metadata, SetTransaction
from .segment import write_last_checkpoint
from .snapshot import Snapshot

# Target actions per checkpoint part; ~500k AddFile rows keeps a part well
# under typical 128MB row-group targets.
ACTIONS_PER_PART = 500_000


def _encode_seg(s):
    # url_encode encodes ' ' as '+': fix to %20 for URI-style paths.
    return F.replace(F.call_function("url_encode", s),
                     F.lit("+"), F.lit("%20"))


def _relativize_col(table_path: str):
    """Canonical absolute path -> log-relative, URI-encoded per segment."""
    root = table_path.rstrip("/") + "/"
    p = F.col("path")
    rel = F.when(p.startswith(root),
                 F.expr(f"substring(path, {len(root) + 1})")).otherwise(p)
    return F.array_join(F.transform(F.split(rel, "/"), _encode_seg), "/")


def write_checkpoint(snapshot: Snapshot, parts: Optional[int] = None) -> int:
    """Write the checkpoint for ``snapshot`` + update ``_last_checkpoint``.
    Returns the number of actions checkpointed."""
    spark = snapshot.spark
    log_path = snapshot.segment.log_path
    table_path = snapshot.table_path

    files = snapshot.files_df
    n_files = files.count()

    add_struct = F.struct(
        _relativize_col(table_path).alias("path"),
        F.col("partitionValues"),
        F.col("size"),
        F.col("modificationTime"),
        F.coalesce(F.col("dataChange"), F.lit(False)).alias("dataChange"),
        F.col("stats"),
        F.col("tags"),
        F.col("baseRowId"),
        F.col("defaultRowCommitVersion"),
    )
    adds_df = files.select(add_struct.alias("add"))
    for f in SINGLE_ACTION_SCHEMA.fields:
        if f.name != "add":
            adds_df = adds_df.withColumn(f.name, F.lit(None).cast(f.dataType))
    adds_df = adds_df.select(*[f.name for f in SINGLE_ACTION_SCHEMA.fields])

    # Tombstones still inside the retention window ride along so readers of
    # the checkpoint alone see them (InMemoryLogReplay.getTombstones).
    tomb = snapshot.tombstones_df
    remove_struct = F.struct(
        _relativize_col(table_path).alias("path"),
        F.col("deletionTimestamp"),
        F.lit(False).alias("dataChange"),
        F.lit(False).alias("extendedFileMetadata"),
        F.lit(None).cast("map<string,string>").alias("partitionValues"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("map<string,string>").alias("tags"),
    )
    tomb_df = tomb.select(remove_struct.alias("remove"))
    for f in SINGLE_ACTION_SCHEMA.fields:
        if f.name != "remove":
            tomb_df = tomb_df.withColumn(f.name, F.lit(None).cast(f.dataType))
    tomb_df = tomb_df.select(*[f.name for f in SINGLE_ACTION_SCHEMA.fields])

    # P&M + txns: a handful of rows, created on the driver.
    import json as _json
    pm_lines = [to_json_line(snapshot.protocol).strip(),
                to_json_line(snapshot.metadata).strip()]
    pm_lines += [to_json_line(SetTransaction(app, v))
                 for app, v in sorted(snapshot.set_transactions.items())]
    from .actions import DomainMetadata
    pm_lines += [to_json_line(DomainMetadata(d, c))
                 for d, c in sorted(snapshot.domain_metadata.items())]
    pm_df = spark.read.json(
        spark.sparkContext.parallelize(pm_lines, 1), schema=SINGLE_ACTION_SCHEMA)

    state = adds_df.unionByName(tomb_df).unionByName(pm_df)
    n_actions = n_files + 2  # approximation for _last_checkpoint "size"

    if parts is None:
        parts = max(1, math.ceil(n_files / ACTIONS_PER_PART))
    state = state.repartition(parts)

    # Publication goes through the snapshot's LogStore (never raw os
    # calls): the POSIX store renames; an object-store store implements
    # rename as its own copy/put. Same temp+publish dance as
    # Checkpoints.scala:267-288.
    store = snapshot.store
    tmp = os.path.join(log_path, f".tmp_ckpt_{uuid.uuid4().hex}")
    state.write.mode("overwrite").option("compression", "snappy").parquet(tmp)
    try:
        part_files = sorted(f for f in store.list_dir(tmp)
                            if f.endswith(".parquet"))
        if len(part_files) == 1:
            store.rename(os.path.join(tmp, part_files[0]),
                         fn.checkpoint_file_single(log_path, snapshot.version))
            written_parts = None
        else:
            names = fn.checkpoint_file_parts(log_path, snapshot.version,
                                             len(part_files))
            for src, dst in zip(part_files, names):
                store.rename(os.path.join(tmp, src), dst)
            written_parts = len(part_files)
    finally:
        store.remove_tree(tmp)

    write_last_checkpoint(snapshot.store, log_path, snapshot.version,
                          n_actions, written_parts)
    return n_actions
