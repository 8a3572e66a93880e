"""Property-based tests for the jar-free SQLite bridge's filter
transpiler: for random rows and random Catalyst filters, the rows a
real sqlite engine returns for the compiled WHERE fragment must equal
the rows a pure-Python evaluation of the filter keeps — so quoting,
LIKE escaping, NULL three-valued logic, IN lists, and NOT composition
cannot drift from Spark's semantics.  No Spark session needed: the
compiler and sqlite3 are both plain Python."""

from __future__ import annotations

import sqlite3

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from pyblazing_spark.sources.sqlite_ds import _compile_filter

#: strings that stress quoting and LIKE metacharacters
_TEXT = st.sampled_from(
    ["", "a", "ab", "a%b", "a_b", "a'b", "100%", "\\", "x\\%y", "it's", "AB"]
)
_NUM = st.one_of(st.integers(-5, 5), st.sampled_from([-1.5, 0.0, 2.5]))


@st.composite
def _rows(draw):
    n = draw(st.integers(1, 12))
    return [
        (
            draw(st.one_of(st.none(), st.integers(-5, 5))),
            draw(st.one_of(st.none(), _TEXT)),
        )
        for _ in range(n)
    ]


@st.composite
def _filter(draw):
    kind = draw(st.integers(0, 9))
    if kind == 0:
        return EqualTo(("i",), draw(_NUM))
    if kind == 1:
        return GreaterThan(("i",), draw(_NUM))
    if kind == 2:
        return LessThan(("i",), draw(_NUM))
    if kind == 3:
        return GreaterThanOrEqual(("i",), draw(_NUM))
    if kind == 4:
        return LessThanOrEqual(("i",), draw(_NUM))
    if kind == 5:
        vals = tuple(draw(st.lists(st.integers(-5, 5), max_size=4)))
        return In(("i",), vals)
    if kind == 6:
        return draw(st.sampled_from([IsNull(("s",)), IsNotNull(("s",))]))
    if kind == 7:
        return StringStartsWith(("s",), draw(_TEXT))
    if kind == 8:
        return StringEndsWith(("s",), draw(_TEXT))
    return StringContains(("s",), draw(_TEXT))


def _py_eval(f, row) -> bool:
    """Spark filter semantics in Python (NULL comparisons are false)."""
    i, s = row
    if isinstance(f, Not):
        # Catalyst only pushes Not over null-intolerant children where
        # three-valued logic is safe; mirror SQL NOT: NULL stays false.
        inner = _py_eval(f.child, row)
        ref = f.child.attribute[0]
        val = i if ref == "i" else s
        if val is None and not isinstance(f.child, (IsNull, IsNotNull)):
            return False
        return not inner
    if isinstance(f, (IsNull, IsNotNull)):
        val = i if f.attribute[0] == "i" else s
        return (val is None) if isinstance(f, IsNull) else (val is not None)
    val = i if f.attribute[0] == "i" else s
    if val is None:
        return False
    if isinstance(f, EqualTo):
        return val == f.value
    if isinstance(f, GreaterThan):
        return val > f.value
    if isinstance(f, GreaterThanOrEqual):
        return val >= f.value
    if isinstance(f, LessThan):
        return val < f.value
    if isinstance(f, LessThanOrEqual):
        return val <= f.value
    if isinstance(f, In):
        return val in f.value
    if isinstance(f, StringStartsWith):
        return str(val).startswith(f.value)
    if isinstance(f, StringEndsWith):
        return str(val).endswith(f.value)
    if isinstance(f, StringContains):
        return f.value in str(val)
    raise AssertionError(f"unhandled filter {f}")


@settings(max_examples=60, deadline=None)
@given(_rows(), st.lists(_filter(), min_size=1, max_size=3))
def test_compiled_where_matches_python_semantics(rows, filters):
    frags = [_compile_filter(f) for f in filters]
    assert all(fr is not None for fr in frags), (filters, frags)
    with sqlite3.connect(":memory:") as con:
        con.execute("CREATE TABLE t (rid INTEGER PRIMARY KEY, i INTEGER, s TEXT)")
        con.executemany(
            "INSERT INTO t (rid, i, s) VALUES (?,?,?)",
            [(k, i, s) for k, (i, s) in enumerate(rows)],
        )
        where = " AND ".join(f"({fr})" for fr in frags)
        got = {r[0] for r in con.execute(f"SELECT rid FROM t WHERE {where}")}
    want = {
        k for k, row in enumerate(rows) if all(_py_eval(f, row) for f in filters)
    }
    assert got == want, (filters, where, rows)


@settings(max_examples=30, deadline=None)
@given(_rows(), _filter())
def test_not_composition_matches(rows, f):
    frag = _compile_filter(Not(f))
    assert frag is not None
    with sqlite3.connect(":memory:") as con:
        con.execute("CREATE TABLE t (rid INTEGER PRIMARY KEY, i INTEGER, s TEXT)")
        con.executemany(
            "INSERT INTO t (rid, i, s) VALUES (?,?,?)",
            [(k, i, s) for k, (i, s) in enumerate(rows)],
        )
        got = {r[0] for r in con.execute(f"SELECT rid FROM t WHERE {frag}")}
    want = {k for k, row in enumerate(rows) if _py_eval(Not(f), row)}
    assert got == want, (f, frag, rows)
