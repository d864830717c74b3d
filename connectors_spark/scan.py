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
        # logical -> physical (identity when column mapping is off):
        # predicates arrive logical; partitionValues keys, stats JSON
        # keys and bloom tag keys live in the physical domain
        self._phys = snapshot.metadata.name_map()

    # ------------------------------------------------------------ files

    def _pv_resolver(self):
        pschema = {f.name: f.dataType
                   for f in self.snapshot.metadata.partition_schema.fields}

        def resolve(name: str):
            return F.col("partitionValues")[
                self._phys.get(name, name)].cast(pschema[name])

        return resolve

    def files(self) -> DataFrame:
        """files_df filtered by the pushed partition predicate and (when
        enabled) by per-file min/max stats. Runs over the Snapshot's
        materialized inventory (``files_local_df``) — the pruning pass
        stays one vectorized Column evaluation, but repeated scans of
        the same Snapshot no longer re-run the log-replay job."""
        df = self.snapshot.files_local_df
        if self.pushed is not None:
            df = df.where(self.pushed.to_column(self._pv_resolver()))
        if self.use_stats and self.residual is not None:
            skip = self._stats_skip_column()
            if skip is not None:
                df = df.where(skip)
        return df

    def collect_files(self) -> List[AddFile]:
        from .log.snapshot import addfiles_from_rows
        return addfiles_from_rows(self.files().collect())

    # ----------------------------------------------------- data skipping

    def _stats_skip_column(self):
        """Build a keep-this-file Column from min/max stats for the
        residual. Handles simple comparisons, IS [NOT] NULL, IN lists,
        AND — and OR recursively: ``keep(a OR b) = keep(a) | keep(b)``
        is sound (a file can only satisfy the disjunction if some
        disjunct's range admits it), which lets disjunctive scans
        (q19-style brand/size alternatives) skip files too. NULL stats
        (older writers) and unrecognized conjunct shapes keep the file
        (never skip on missing evidence)."""
        data_fields = {f.name: f.dataType
                       for f in self.snapshot.metadata.data_schema.fields}

        def stat(kind: str, col: str, dtype):
            p = self._phys.get(col, col)
            return F.get_json_object(F.col("stats"),
                                     f"$.{kind}.{p}").cast(dtype)

        conds = [k for k in
                 (self._keep_condition(c, data_fields, stat)
                  for c in split_conjuncts(self.residual))
                 if k is not None]
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def _keep_condition(self, c, data_fields, stat):
        """Keep-file Column for one predicate node, or None when the
        node's shape carries no skippable evidence."""
        from .expressions import And, Or
        if isinstance(c, And):
            # AND: evidence from either side narrows; missing side = True.
            ks = [k for k in (self._keep_condition(s, data_fields, stat)
                              for s in (c.left, c.right)) if k is not None]
            if not ks:
                return None
            out = ks[0]
            for k in ks[1:]:
                out = out & k
            return out
        if isinstance(c, Or):
            # OR: BOTH branches must be boundable, else no evidence.
            k1 = self._keep_condition(c.left, data_fields, stat)
            k2 = self._keep_condition(c.right, data_fields, stat)
            if k1 is None or k2 is None:
                return None
            return k1 | k2
        null_keep = self._null_check_keep(c, data_fields)
        if null_keep is not None:
            return null_keep
        in_keep = self._in_list_keep(c, data_fields, stat)
        if in_keep is not None:
            return in_keep
        col, lit, op = _simple_comparison(c)
        if col is None or col not in data_fields:
            return None
        dtype = data_fields[col]
        if dtype.simpleString() not in (
                "tinyint", "smallint", "int", "bigint", "float", "double",
                "date", "timestamp", "string") and \
                not dtype.simpleString().startswith("decimal"):
            return None
        lo, hi = stat("minValues", col, dtype), stat("maxValues", col, dtype)
        v = F.lit(lit.value)
        if op == "=":
            keep = (lo <= v) & (hi >= v)
        elif op in (">", ">="):
            keep = hi >= v if op == ">=" else hi > v
        elif op in ("<", "<="):
            keep = lo <= v if op == "<=" else lo < v
        else:
            return None
        keep = F.coalesce(keep, F.lit(True))
        if op == "=":
            bk = self._bloom_keep(col, lit.value)
            if bk is not None:
                keep = keep & bk
        return keep

    def _bloom_keep(self, col: str, value):
        """Per-file bloom test for an equality probe (bloom.py): a
        clean miss proves absence, a hit or a missing/out-of-scope tag
        keeps the file. Pure Column expression over files_df.tags —
        the file inventory is never collected to test it."""
        from .bloom import TAG_PREFIX, bloom_keep_column
        return bloom_keep_column(
            F.col("tags")[TAG_PREFIX + self._phys.get(col, col)], value)

    def _null_check_keep(self, c, data_fields):
        """Keep-file condition for ``col IS [NOT] NULL`` conjuncts from
        the already-collected ``nullCount`` / ``numRecords`` stats:
        IS NULL keeps a file only if it has >0 nulls; IS NOT NULL only
        if it has at least one non-null row. Missing stats keep the
        file (never skip on missing evidence). Returns None when the
        conjunct isn't a null check on a stats-able data column."""
        from .expressions import IsNotNull, IsNull
        if not isinstance(c, (IsNull, IsNotNull)) or \
                not isinstance(c.child, Col):
            return None
        col = c.child.name
        if col not in data_fields:
            return None
        nulls = F.get_json_object(
            F.col("stats"),
            f"$.nullCount.{self._phys.get(col, col)}").cast("long")
        nrec = F.get_json_object(
            F.col("stats"), "$.numRecords").cast("long")
        if isinstance(c, IsNull):
            keep = nulls > 0
        else:
            keep = nulls < nrec
        return F.coalesce(keep, F.lit(True))

    _IN_SKIP_MAX_VALUES = 64
    # Bloom composition bound for LARGE IN lists (runtime join-key
    # pruning routinely hands us hundreds of keys). The test is one
    # array-literal exists-expression (bloom.bloom_keep_any_column),
    # so the cost bound is plan-size/probe-time, but so is the
    # BENEFIT bound: a file is skipped only when ALL n values miss,
    # and with per-value fpp p the false-keep probability is
    # 1-(1-p)^n (~0.8% auto-sized → ~87% at n=256). Past the cap the
    # filter can no longer prove much, so we stop paying for it.
    _IN_BLOOM_MAX_VALUES = 256

    def _in_list_keep(self, c, data_fields, stat):
        """Keep-file condition for an ``col IN (literals)`` conjunct:
        OR of per-value range containment for short lists, else the
        [min(values), max(values)] envelope (sound, just looser) AND —
        up to _IN_BLOOM_MAX_VALUES — a single any-value bloom test.
        Returns None when the conjunct isn't a stats-able IN."""
        from .expressions import Col as ColExpr
        from .expressions import In, Lit as LitExpr
        if not isinstance(c, In) or not isinstance(c.value, ColExpr):
            return None
        if not all(isinstance(e, LitExpr) for e in c.elems):
            return None
        col = c.value.name
        if col not in data_fields:
            return None
        dtype = data_fields[col]
        if dtype.simpleString() not in (
                "tinyint", "smallint", "int", "bigint", "float", "double",
                "date", "timestamp", "string") and                 not dtype.simpleString().startswith("decimal"):
            return None
        values = [e.value for e in c.elems if e.value is not None]
        if not values:
            return None
        lo, hi = stat("minValues", col, dtype), stat("maxValues", col, dtype)
        if len(values) <= self._IN_SKIP_MAX_VALUES:
            keep = None
            for v in values:
                term = F.coalesce((lo <= F.lit(v)) & (hi >= F.lit(v)),
                                  F.lit(True))
                bk = self._bloom_keep(col, v)
                if bk is not None:
                    # per-value conjunction: the file can serve value v
                    # only if BOTH its range admits v and its bloom
                    # doesn't prove v absent
                    term = term & bk
                keep = term if keep is None else (keep | term)
            return keep
        keep = F.coalesce((lo <= F.lit(max(values)))
                          & (hi >= F.lit(min(values))), F.lit(True))
        if len(values) <= self._IN_BLOOM_MAX_VALUES:
            from .bloom import TAG_PREFIX, bloom_keep_any_column
            bk = bloom_keep_any_column(
                F.col("tags")[TAG_PREFIX + self._phys.get(col, col)],
                values)
            if bk is not None:
                # envelope ∧ any-value bloom: the file can serve the IN
                # only if its range admits SOME value and the bloom
                # doesn't prove every value absent
                keep = keep & bk
        return keep

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


def prune_by_join_keys(table, key_col: str, keys_df,
                       max_keys: int = 100_000):
    """Dynamic (runtime) file pruning by join keys — the metadata-plane
    analogue of Spark's dynamic partition pruning, which cannot see our
    log-backed file listing. Collect the (bounded) distinct join keys
    from the dimension side, build an ``In`` predicate, and scan the
    fact table with it: partition-valued keys prune whole directories,
    other keys prune via per-file min/max stats, and the same predicate
    re-applies row-level as the residual. Falls back to an unpruned scan
    when the key set exceeds ``max_keys`` (an IN list that large stops
    paying for itself — at that point a shuffle join is the plan).

    Returns the pruned DeltaScan; caller chains ``.to_df()`` and joins.
    """
    from .expressions import Col
    rows = keys_df.distinct().limit(max_keys + 1).collect()
    if len(rows) > max_keys:
        return table.scan(None)
    keys = sorted(r[0] for r in rows if r[0] is not None)
    if not keys:
        return table.scan(None)
    return table.scan(Col(key_col).isin(*keys))
