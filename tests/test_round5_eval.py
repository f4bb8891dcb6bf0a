"""Round-5: DataFrame.eval multi-line / mixed forms + @external refs —
differential vs real pandas (reference tests/pandas/ strategy; the reference's
query() supports @external refs from the caller's frame, core/query.py:33-311)."""

import pandas as pd
import pandas.testing as pdt
import pytest

import legate_pandas_spark as lps


@pytest.fixture()
def pdf():
    return pd.DataFrame(
        {
            "a": [1.0, 2.0, 3.0, 4.0, 5.0],
            "b": [10.0, 20.0, 30.0, 40.0, 50.0],
            "c": [2.0, 2.0, 3.0, 3.0, 4.0],
        }
    )


def _cmp(got, want):
    pdt.assert_frame_equal(
        got.to_pandas().reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_eval_multiline_assignments(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    expr = "d = a + b\ne = d * 2"
    _cmp(ldf.eval(expr), pdf.eval(expr))


def test_eval_later_line_sees_earlier_target(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    expr = "x = a * c\ny = x + b\nz = y - x"
    _cmp(ldf.eval(expr), pdf.eval(expr))


def test_eval_overwrite_existing_column(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    expr = "a = a + 100\nd = a / b"
    _cmp(ldf.eval(expr), pdf.eval(expr))


def test_eval_mixed_assignment_and_bare_raises(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    expr = "d = a + b\nd * 2"
    with pytest.raises(ValueError):
        pdf.eval(expr)
    with pytest.raises(ValueError):
        ldf.eval(expr)


def test_eval_inplace(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    want = pdf.copy()
    assert want.eval("d = a + b", inplace=True) is None
    assert ldf.eval("d = a + b", inplace=True) is None
    _cmp(ldf, want)


def test_eval_inplace_bare_raises(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    with pytest.raises(ValueError):
        pdf.eval("a + b", inplace=True)
    with pytest.raises(ValueError):
        ldf.eval("a + b", inplace=True)


def test_eval_external_ref_caller_locals(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    scale = 3.0  # resolved from THIS frame's locals, pandas-style
    _cmp(ldf.eval("d = a * @scale"), pdf.eval("d = a * @scale"))


def test_eval_external_ref_multiline(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    lo, hi = 1.5, 45.0
    expr = "d = a + @lo\ne = b - @hi"
    _cmp(ldf.eval(expr), pdf.eval(expr))


def test_eval_explicit_kwarg_overrides_local(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    scale = 3.0
    got = ldf.eval("d = a * @scale", scale=10.0).to_pandas().reset_index(drop=True)
    want = pdf.eval("d = a * 10.0")
    pdt.assert_frame_equal(got, want.reset_index(drop=True), check_dtype=False)
    assert scale == 3.0


def test_eval_bare_expression_series(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.eval("a * b + c").to_pandas().reset_index(drop=True)
    want = pdf.eval("a * b + c").reset_index(drop=True)
    pdt.assert_series_equal(got, want, check_dtype=False, check_names=False)


def test_query_external_ref_caller_locals(pdf, spark):
    ldf = lps.from_pandas(pdf, spark=spark)
    cut = 25.0
    got = ldf.query("b > @cut").to_pandas().reset_index(drop=True)
    want = pdf.query("b > @cut").reset_index(drop=True)
    pdt.assert_frame_equal(got, want, check_dtype=False)
