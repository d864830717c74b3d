"""Vector column functions over `array<float>` embeddings.

All arithmetic is forced to DOUBLE before multiply/accumulate so the
result is bit-reproducible against a double-precision SQL oracle
(float32 accumulation differs in the 7th decimal). Everything is a
single codegen'd expression — `zip_with`/`aggregate`/`transform` run
JVM-side per row with zero Python crossings, which at 100 TB is the
difference between a map-only scan and a Python-bottlenecked one.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _c(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def dot_d(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Double-precision dot product of two array<float> columns."""
    prods = F.zip_with(_c(a), _c(b),
                       lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_d(a: ColumnOrName) -> Column:
    """Double-precision L2 norm of an array<float> column."""
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_d(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Double-precision cosine similarity."""
    return dot_d(a, b) / norm_d(a) / norm_d(b)


def quantize_i8(a: ColumnOrName) -> Column:
    """Symmetric int8 quantization: scale = max|v|/127, q_i =
    round(v_i/scale). Returns struct(scale double, q array<int>). All
    arithmetic in double with SQL round semantics (half away from zero)
    so a SQL oracle reproduces the exact codes."""
    v = F.transform(_c(a), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = mx / F.lit(127.0)
    q = F.transform(v, lambda x: F.round(x / scale, 0).cast("int"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_error_i8(a: ColumnOrName) -> Column:
    """Max absolute reconstruction error of the int8 round trip,
    normalized by the scale (≤ 0.5 by construction)."""
    qz = quantize_i8(a)
    v = F.transform(_c(a), lambda x: x.cast("double"))
    err = F.zip_with(v, qz["q"],
                     lambda x, qi: F.abs(qi.cast("double") * qz["scale"] - x))
    return F.array_max(err) / qz["scale"]
