"""Round-5: hypothesis property test for the query()/eval() expression
translator — random expression trees rendered to pandas-query syntax, run
through BOTH pandas.query and the facade's AST→Catalyst translation, row sets
compared. This is the reference's one UDF surface (core/query.py:33-311), so
grammar-wide agreement is the parity claim that matters."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps

COLS = ["a", "b", "c"]


@st.composite
def arith(draw, depth=0):
    """Arithmetic expression over numeric columns and integer constants."""
    if depth >= 2 or draw(st.booleans()):
        kind = draw(st.sampled_from(["col", "const"]))
        if kind == "col":
            return draw(st.sampled_from(COLS))
        return str(draw(st.integers(-9, 9)))
    op = draw(st.sampled_from(["+", "-", "*", "%", "//"]))
    left = draw(arith(depth=depth + 1))
    right = draw(arith(depth=depth + 1))
    if op in ("%", "//"):
        # nonzero constant divisor (both engines raise/inf on zero); signs
        # intentionally mixed — floored-modulo parity is under test
        d = draw(st.sampled_from(["2", "3", "-3", "5", "-7"]))
        return f"({left} {op} {d})"
    return f"({left} {op} {right})"


@st.composite
def const_arith(draw, depth=0):
    """Column-free arithmetic — scalar-logic atoms (round-9: pandas' python
    engine evaluates these as native Python scalars under &/|/~)."""
    if depth >= 2 or draw(st.booleans()):
        return str(draw(st.integers(-9, 9)))
    op = draw(st.sampled_from(["+", "-", "*"]))
    return f"({draw(const_arith(depth=depth + 1))} {op} {draw(const_arith(depth=depth + 1))})"


@st.composite
def predicate(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        cmp = draw(st.sampled_from(["<", "<=", ">", ">=", "==", "!="]))
        # ~1 in 5 atoms is column-free, exercising the scalar-logic compiler
        if draw(st.integers(0, 4)) == 0:
            return f"({draw(const_arith())} {cmp} {draw(const_arith())})"
        return f"({draw(arith())} {cmp} {draw(arith())})"
    joiner = draw(st.sampled_from(["and", "or"]))
    neg = draw(st.booleans())
    p = f"({draw(predicate(depth=depth + 1))} {joiner} {draw(predicate(depth=depth + 1))})"
    return f"(not {p})" if neg else p


_PDF = pd.DataFrame(
    {
        "a": [-7, -3, -1, 0, 1, 2, 5, 9, 12, -12],
        "b": [3, -4, 7, 2, -9, 0, 1, -1, 6, 8],
        "c": [0, 1, -2, 5, 3, -8, 13, 4, -6, 2],
    }
)
_LDF = None


def _ldf(spark):
    global _LDF
    if _LDF is None:
        _LDF = lps.from_pandas(_PDF, spark=spark)
    return _LDF


def _anchor(expr: str) -> str:
    """pandas rejects constant-only expressions — anchor with a column ref
    (word-boundary match: the 'a' inside 'and' must not count)."""
    import re as _re

    if not _re.search(r"\b[abc]\b", expr):
        return f"((a == a) and {expr})"
    return expr


@settings(max_examples=60, deadline=None)
@given(predicate())
def test_query_translator_matches_pandas(spark, expr):
    expr = _anchor(expr)
    want = _PDF.query(expr)
    got = _ldf(spark).query(expr).to_pandas()
    got_rows = sorted(map(tuple, got[COLS].values.tolist()))
    want_rows = sorted(map(tuple, want[COLS].values.tolist()))
    assert got_rows == want_rows, expr


@settings(max_examples=30, deadline=None)
@given(arith())
def test_eval_arith_matches_pandas(spark, expr):
    import re as _re

    if not _re.search(r"\b[abc]\b", expr):
        expr = f"((a - a) + {expr})"
    want = _PDF.eval(expr).tolist()
    got = _ldf(spark).eval(expr).to_pandas().tolist()
    assert [round(float(g), 9) for g in got] == [
        round(float(w), 9) for w in want
    ], expr


def test_floored_modulo_all_sign_combos(spark):
    got = _ldf(spark).eval("a % b").to_pandas().tolist()
    want = _PDF.eval("a % b").tolist()  # rows where b == 0 give NaN vs null
    for g, w in zip(got, want):
        if pd.isna(w):
            assert g is None or pd.isna(g)
        else:
            assert float(g) == float(w)


_PDF_NAN = pd.DataFrame(
    {
        "a": [-7.0, None, -1.0, 0.0, None, 2.0, 5.0, 9.0, 12.0, -12.0],
        "b": [3.0, -4.0, None, 2.0, -9.0, 0.0, 1.0, None, 6.0, 8.0],
        "c": [0.0, 1.0, -2.0, None, 3.0, -8.0, None, 4.0, -6.0, 2.0],
    }
)
_LDF_NAN = None


def _ldf_nan(spark):
    global _LDF_NAN
    if _LDF_NAN is None:
        _LDF_NAN = lps.from_pandas(_PDF_NAN, spark=spark)
    return _LDF_NAN


@settings(max_examples=60, deadline=None)
@given(predicate())
def test_query_translator_matches_pandas_with_nans(spark, expr):
    """Round-8: the same grammar over NaN-bearing float data — locks the
    pandas-exact total comparison atoms (null->FALSE; != -> TRUE; not/and/or
    two-valued). Bare three-valued SQL dropped NaN rows under `not (k == 1)`
    and `k != 1`; this suite would have caught it."""
    expr = _anchor(expr)
    want = _PDF_NAN.query(expr)
    got = _ldf_nan(spark).query(expr).to_pandas()
    cols = ["a", "b", "c"]
    canon = lambda df: sorted(  # noqa: E731
        tuple(-9e99 if pd.isna(v) else round(float(v), 9) for v in row)
        for row in df[cols].values.tolist()
    )
    assert canon(got) == canon(want), expr
