"""Expression null semantics: our AST's strict eval must agree with Spark SQL
(property-tested with hypothesis; mirrors the reference's ExpressionSuite)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from connectors_spark.expressions import (And, Col, EqualTo, In, IsNotNull,
                                          IsNull, Lit, Not, Or,
                                          split_metadata_and_data)

vals = st.one_of(st.none(), st.integers(-5, 5))


def _tv(b):
    """truth value: True/False/None"""
    return b


@given(vals, vals)
@settings(max_examples=200, deadline=None)
def test_comparison_null_propagation(a, b):
    row = {"x": a, "y": b}
    e = EqualTo(Col("x"), Col("y"))
    got = e.eval(row)
    want = None if (a is None or b is None) else (a == b)
    assert got == want


@given(vals, vals)
@settings(max_examples=200, deadline=None)
def test_and_or_three_valued(a, b):
    row = {"x": a, "y": b}
    gx = IsNotNull(Col("x")).eval(row)
    p = EqualTo(Col("x"), Lit(1))
    q = EqualTo(Col("y"), Lit(2))
    pa, qa = p.eval(row), q.eval(row)
    got_and = And(p, q).eval(row)
    got_or = Or(p, q).eval(row)
    # Kleene logic
    want_and = False if (pa is False or qa is False) else (
        None if (pa is None or qa is None) else True)
    want_or = True if (pa is True or qa is True) else (
        None if (pa is None or qa is None) else False)
    assert got_and == want_and
    assert got_or == want_or
    assert gx == (a is not None)


@given(vals, st.lists(vals, max_size=5))
@settings(max_examples=200, deadline=None)
def test_in_three_valued(v, elems):
    """In.java:79-98: null value -> null; match -> true; no match ->
    false unless a null elem -> null."""
    row = {"x": v}
    got = In(Col("x"), [Lit(e) for e in elems]).eval(row)
    if v is None:
        want = None
    elif any(e == v for e in elems if e is not None):
        want = True
    elif any(e is None for e in elems):
        want = None
    else:
        want = False
    assert got == want


def test_not_and_isnull():
    assert Not(Lit(True)).eval({}) is False
    assert Not(Lit(None)).eval({}) is None
    assert IsNull(Col("x")).eval({"x": None}) is True
    assert IsNull(Col("x")).eval({"x": 1}) is False


def test_split_metadata_and_data():
    pred = And(And(EqualTo(Col("p"), Lit(1)), EqualTo(Col("d"), Lit(2))),
               Or(EqualTo(Col("p"), Lit(3)), EqualTo(Col("q"), Lit(4))))
    meta, data = split_metadata_and_data(pred, ["p", "q"])
    assert meta is not None and data is not None
    assert meta.references() <= {"p", "q"}
    assert "d" in data.references()
    # case-insensitivity (PartitionUtils.isPredicateMetadataOnly:85-92)
    meta2, data2 = split_metadata_and_data(
        EqualTo(Col("P"), Lit(1)), ["p"])
    assert meta2 is not None and data2 is None


def test_spark_agreement(spark):
    """Cross-check eval() against Spark SQL on a null-rich DataFrame."""
    from pyspark.sql import functions as F
    rows = [(None, None), (1, None), (None, 2), (1, 2), (3, 3)]
    df = spark.createDataFrame(rows, "x int, y int")
    exprs = [
        EqualTo(Col("x"), Col("y")),
        And(EqualTo(Col("x"), Lit(1)), EqualTo(Col("y"), Lit(2))),
        Or(IsNull(Col("x")), EqualTo(Col("y"), Lit(3))),
        In(Col("x"), [Lit(1), Lit(None)]),
        Not(EqualTo(Col("x"), Lit(1))),
    ]
    pdf = df.toPandas()
    for e in exprs:
        got_spark = [r[0] for r in df.select(e.to_column(F.col)).collect()]
        got_eval = [e.eval({"x": None if str(r.x) == "nan" or r.x is None
                            else int(r.x),
                            "y": None if str(r.y) == "nan" or r.y is None
                            else int(r.y)})
                    for r in pdf.itertuples()]
        assert got_spark == got_eval, str(e)
