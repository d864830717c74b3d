"""Pruned file scans (reference: DeltaScanImpl / FilteredDeltaScanImpl,
``standalone/.../scan/DeltaScanImpl.scala:73-166``,
``FilteredDeltaScanImpl.scala:46-81``).

The predicate is split into a metadata conjunct (partition columns only)
and a residual (PartitionUtils.scala:61-99). The metadata conjunct is
compiled to a Spark Column over typed lookups into ``partitionValues``
(E10: ``partitionValues[c]`` cast to the partition schema type --
PartitionRowRecord.scala:41-160) and applied to ``files_df`` in one
vectorized pass -- the reference's per-file memoized evaluation
(FilteredDeltaScanImpl.scala:54-71) is subsumed by codegen.

Stats-based data skipping (an extension the reference carries opaquely in
``AddFile.stats``, actions.scala:116-117): min/max per file are consulted
for simple comparison conjuncts on non-partition columns, skipping files
whose range can't satisfy the predicate.
"""

from __future__ import annotations

import json
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .expressions import (Col, EqualTo, Expression, GreaterThan,
                          GreaterThanOrEqual, LessThan, LessThanOrEqual, Lit,
                          split_conjuncts, split_metadata_and_data)
from .log.actions import AddFile
from .log.snapshot import Snapshot


class DeltaScan:
    def __init__(self, snapshot: Snapshot, predicate: Optional[Expression] = None,
                 use_stats: bool = True):
        self.snapshot = snapshot
        self.predicate = predicate
        pcols = snapshot.metadata.partitionColumns
        self.pushed, self.residual = split_metadata_and_data(predicate, pcols)
        self.use_stats = use_stats

    # ------------------------------------------------------------ files

    def _pv_resolver(self):
        pschema = {f.name: f.dataType
                   for f in self.snapshot.metadata.partition_schema.fields}

        def resolve(name: str):
            return F.col("partitionValues")[name].cast(pschema[name])

        return resolve

    def files(self) -> DataFrame:
        """files_df filtered by the pushed partition predicate and (when
        enabled) by per-file min/max stats."""
        df = self.snapshot.files_df
        if self.pushed is not None:
            df = df.where(self.pushed.to_column(self._pv_resolver()))
        if self.use_stats and self.residual is not None:
            skip = self._stats_skip_column()
            if skip is not None:
                df = df.where(skip)
        return df

    def collect_files(self) -> List[AddFile]:
        rows = self.files().collect()
        return [AddFile(path=r["path"],
                        partitionValues=dict(r["partitionValues"] or {}),
                        size=r["size"] or 0,
                        modificationTime=r["modificationTime"] or 0,
                        stats=r["stats"],
                        tags=dict(r["tags"]) if r["tags"] else None)
                for r in rows]

    # ----------------------------------------------------- data skipping

    def _stats_skip_column(self):
        """Build a keep-this-file Column from min/max stats for the residual's
        simple comparison conjuncts. NULL stats (older writers) keep the file
        (never skip on missing evidence)."""
        data_fields = {f.name: f.dataType
                       for f in self.snapshot.metadata.data_schema.fields}

        def stat(kind: str, col: str, dtype):
            return F.get_json_object(F.col("stats"), f"$.{kind}.{col}").cast(dtype)

        conds = []
        for c in split_conjuncts(self.residual):
            col, lit, op = _simple_comparison(c)
            if col is None or col not in data_fields:
                continue
            dtype = data_fields[col]
            if dtype.simpleString() not in (
                    "tinyint", "smallint", "int", "bigint", "float", "double",
                    "date", "timestamp", "string") and \
                    not dtype.simpleString().startswith("decimal"):
                continue
            lo, hi = stat("minValues", col, dtype), stat("maxValues", col, dtype)
            v = F.lit(lit.value)
            if op == "=":
                keep = (lo <= v) & (hi >= v)
            elif op in (">", ">="):
                keep = hi >= v if op == ">=" else hi > v
            elif op in ("<", "<="):
                keep = lo <= v if op == "<=" else lo < v
            else:
                continue
            conds.append(F.coalesce(keep, F.lit(True)))
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    # ------------------------------------------------------------- data

    def to_df(self) -> DataFrame:
        """Table rows surviving the full predicate. The residual is applied
        to the data scan where Catalyst pushes it into the Parquet reader
        (PushedFilters) -- the reference leaves the residual to the caller
        (DeltaScan.java:59-66); as an engine we apply it."""
        residual_col = self.residual.to_column(F.col) \
            if self.residual is not None else None
        return self.snapshot.to_df(files=self.files(), residual=residual_col)


def _simple_comparison(e: Expression):
    """Return (col_name, Lit, op) for ``col <op> literal`` shapes else
    (None, None, None)."""
    ops = {EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
           LessThan: "<", LessThanOrEqual: "<="}
    flipped = {">": "<", ">=": "<=", "<": ">", "<=": ">=", "=": "="}
    for cls, op in ops.items():
        if isinstance(e, cls):
            l, r = e.left, e.right
            if isinstance(l, Col) and isinstance(r, Lit) and r.value is not None:
                return l.name, r, op
            if isinstance(l, Lit) and isinstance(r, Col) and l.value is not None:
                return r.name, l, flipped[op]
    return None, None, None
