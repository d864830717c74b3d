"""Predicate expression tree for partition pruning and conflict detection.

Re-expresses the reference's strict-eval expression language
(``standalone/src/main/java/io/delta/standalone/expressions/``: Column,
Literal, comparisons, And/Or/Not, IsNull/IsNotNull, In) as a small Python
AST that can

- compile to a ``pyspark.sql.Column`` (vectorized, codegen'd evaluation over
  ``files_df`` -- E10's file-list filter in one distributed pass), and
- strictly evaluate against a plain dict of decoded partition values
  (driver-side use in the conflict checker, ConflictChecker.scala:148-173),

with the same SQL 3-valued null semantics (BinaryExpression.eval returns
null if either side is null, In.java:79-98 for IN).

``split_metadata_and_data`` mirrors
PartitionUtils.splitMetadataAndDataPredicates (PartitionUtils.scala:61-99):
conjuncts that only reference partition columns (case-insensitively) are
prunable; the rest is the residual the data scan applies.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any, Dict, FrozenSet, List, Optional, Sequence, Tuple

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F


class Expression:
    def references(self) -> FrozenSet[str]:
        raise NotImplementedError

    def to_column(self, resolver=F.col) -> SparkColumn:
        """Compile to a Spark Column; ``resolver`` maps a column name to the
        Column expression to read it from (e.g. a typed partitionValues
        lookup)."""
        raise NotImplementedError

    def eval(self, row: Dict[str, Any]) -> Any:
        """Strict 3-valued evaluation against a dict (None = SQL NULL)."""
        raise NotImplementedError

    # sugar
    def __and__(self, other: "Expression") -> "And":
        return And(self, other)

    def __or__(self, other: "Expression") -> "Or":
        return Or(self, other)

    def __invert__(self) -> "Not":
        return Not(self)


@dataclass(frozen=True)
class Col(Expression):
    """Field reference (expressions/Column.java:19)."""

    name: str

    def references(self):
        return frozenset([self.name])

    def to_column(self, resolver=F.col):
        return resolver(self.name)

    def eval(self, row):
        return row.get(self.name)

    # comparison sugar
    def __eq__(self, other):  # type: ignore[override]
        return EqualTo(self, _lit(other))

    def __gt__(self, other):
        return GreaterThan(self, _lit(other))

    def __ge__(self, other):
        return GreaterThanOrEqual(self, _lit(other))

    def __lt__(self, other):
        return LessThan(self, _lit(other))

    def __le__(self, other):
        return LessThanOrEqual(self, _lit(other))

    def __hash__(self):
        return hash(("Col", self.name))

    def is_null(self) -> "IsNull":
        return IsNull(self)

    def is_not_null(self) -> "IsNotNull":
        return IsNotNull(self)

    def isin(self, *values) -> "In":
        return In(self, [_lit(v) for v in values])


@dataclass(frozen=True)
class Lit(Expression):
    """Typed constant (expressions/Literal.java:17,65-158)."""

    value: Any

    def references(self):
        return frozenset()

    def to_column(self, resolver=F.col):
        return F.lit(self.value)

    def eval(self, row):
        return self.value


def _lit(v) -> Expression:
    return v if isinstance(v, Expression) else Lit(v)


def _cmp(a: Any, b: Any) -> Optional[int]:
    if a is None or b is None:
        return None
    if isinstance(a, _dt.datetime) and isinstance(b, _dt.datetime):
        pass
    return (a > b) - (a < b)


@dataclass(frozen=True)
class _Binary(Expression):
    left: Expression
    right: Expression

    def references(self):
        return self.left.references() | self.right.references()


class EqualTo(_Binary):
    def to_column(self, resolver=F.col):
        return self.left.to_column(resolver) == self.right.to_column(resolver)

    def eval(self, row):
        c = _cmp(self.left.eval(row), self.right.eval(row))
        return None if c is None else c == 0


class GreaterThan(_Binary):
    def to_column(self, resolver=F.col):
        return self.left.to_column(resolver) > self.right.to_column(resolver)

    def eval(self, row):
        c = _cmp(self.left.eval(row), self.right.eval(row))
        return None if c is None else c > 0


class GreaterThanOrEqual(_Binary):
    def to_column(self, resolver=F.col):
        return self.left.to_column(resolver) >= self.right.to_column(resolver)

    def eval(self, row):
        c = _cmp(self.left.eval(row), self.right.eval(row))
        return None if c is None else c >= 0


class LessThan(_Binary):
    def to_column(self, resolver=F.col):
        return self.left.to_column(resolver) < self.right.to_column(resolver)

    def eval(self, row):
        c = _cmp(self.left.eval(row), self.right.eval(row))
        return None if c is None else c < 0


class LessThanOrEqual(_Binary):
    def to_column(self, resolver=F.col):
        return self.left.to_column(resolver) <= self.right.to_column(resolver)

    def eval(self, row):
        c = _cmp(self.left.eval(row), self.right.eval(row))
        return None if c is None else c <= 0


class And(_Binary):
    def to_column(self, resolver=F.col):
        return self.left.to_column(resolver) & self.right.to_column(resolver)

    def eval(self, row):
        l, r = self.left.eval(row), self.right.eval(row)
        if l is False or r is False:
            return False
        if l is None or r is None:
            return None
        return True


class Or(_Binary):
    def to_column(self, resolver=F.col):
        return self.left.to_column(resolver) | self.right.to_column(resolver)

    def eval(self, row):
        l, r = self.left.eval(row), self.right.eval(row)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False


@dataclass(frozen=True)
class Not(Expression):
    child: Expression

    def references(self):
        return self.child.references()

    def to_column(self, resolver=F.col):
        return ~self.child.to_column(resolver)

    def eval(self, row):
        v = self.child.eval(row)
        return None if v is None else (not v)


@dataclass(frozen=True)
class IsNull(Expression):
    child: Expression

    def references(self):
        return self.child.references()

    def to_column(self, resolver=F.col):
        return self.child.to_column(resolver).isNull()

    def eval(self, row):
        return self.child.eval(row) is None


@dataclass(frozen=True)
class IsNotNull(Expression):
    child: Expression

    def references(self):
        return self.child.references()

    def to_column(self, resolver=F.col):
        return self.child.to_column(resolver).isNotNull()

    def eval(self, row):
        return self.child.eval(row) is not None


@dataclass(frozen=True)
class In(Expression):
    """3-valued SQL IN (In.java:31,79-98): true if found; false if not found
    and no nulls in the list; null if the value is null or the list contains
    a null without a match. Spark's ``isin`` agrees."""

    value: Expression
    elems: Tuple[Expression, ...]

    def __init__(self, value: Expression, elems: Sequence[Expression]):
        object.__setattr__(self, "value", value)
        object.__setattr__(self, "elems", tuple(elems))

    def references(self):
        out = self.value.references()
        for e in self.elems:
            out |= e.references()
        return out

    def to_column(self, resolver=F.col):
        return self.value.to_column(resolver).isin(
            *[e.to_column(resolver) for e in self.elems])

    def eval(self, row):
        v = self.value.eval(row)
        if v is None:
            return None
        saw_null = False
        for e in self.elems:
            ev = e.eval(row)
            if ev is None:
                saw_null = True
            elif _cmp(v, ev) == 0:
                return True
        return None if saw_null else False


def split_conjuncts(expr: Expression) -> List[Expression]:
    if isinstance(expr, And):
        return split_conjuncts(expr.left) + split_conjuncts(expr.right)
    return [expr]


def split_metadata_and_data(
        expr: Optional[Expression],
        partition_columns: Sequence[str],
) -> Tuple[Optional[Expression], Optional[Expression]]:
    """(metadata_predicate, data_predicate) — PartitionUtils.scala:61-99.
    Conjuncts referencing only partition columns (case-insensitive) prune
    files; the rest is residual for the data scan."""
    if expr is None:
        return None, None
    pset = {c.lower() for c in partition_columns}
    meta: List[Expression] = []
    data: List[Expression] = []
    for c in split_conjuncts(expr):
        refs = {r.lower() for r in c.references()}
        if refs and refs <= pset:
            meta.append(c)
        else:
            data.append(c)

    def _combine(parts: List[Expression]) -> Optional[Expression]:
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = And(out, p)
        return out

    return _combine(meta), _combine(data)
