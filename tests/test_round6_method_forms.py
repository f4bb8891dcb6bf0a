"""Round-6 parity: pandas method-form binops (add/radd/.../rpow with
fill_value, eq/ne/lt/le/gt/ge), aggregate aliases, Series.repeat, and the
FLOORED-modulo fix (Series/Frame '%' previously truncated like Spark; pandas
follows Python's floored semantics) — all differential vs real pandas."""

import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture(scope="module")
def frames(spark):
    pdf = pd.DataFrame(
        {
            "a": [1.0, None, 3.0, -7.0, 5.0],
            "b": [10.0, 20.0, None, 3.0, -2.0],
        }
    )
    return pdf, lps.from_pandas(pdf, spark=spark)


def _cmp(got, want):
    assert got.fillna(-999).tolist() == want.fillna(-999).tolist(), (got, want)


@pytest.mark.parametrize(
    "op", ["add", "radd", "sub", "rsub", "mul", "rmul", "div", "rdiv",
           "floordiv", "rfloordiv", "mod", "rmod", "pow", "rpow"]
)
def test_series_method_forms_fill_value(frames, op):
    pdf, ldf = frames
    got = getattr(ldf["a"], op)(ldf["b"], fill_value=2.0).to_pandas()
    want = getattr(pdf["a"], op)(pdf["b"], fill_value=2.0)
    _cmp(got, want)
    # scalar other, no fill
    got = getattr(ldf["a"], op)(3.0).to_pandas()
    want = getattr(pdf["a"], op)(3.0)
    _cmp(got, want)


@pytest.mark.parametrize("op", ["eq", "ne", "lt", "le", "gt", "ge"])
def test_series_comparison_method_forms(frames, op):
    # engine contract (round-9): comparisons match pandas on nulls too —
    # NaN compares False for eq/lt/le/gt/ge and TRUE for ne (pandas float
    # semantics; the round-8 query() total-atom compilation, now shared by
    # the mask/method forms). Fully differential.
    pdf, ldf = frames
    got = getattr(ldf["a"], op)(3.0).to_pandas().astype(bool)
    want = getattr(pdf["a"], op)(3.0)
    assert got.tolist() == want.tolist()


@pytest.mark.parametrize("op", ["radd", "rsub", "rmul", "rdiv", "rmod", "rpow"])
def test_frame_reversed_method_forms(frames, op):
    pdf, ldf = frames
    got = getattr(ldf, op)(2.0).to_pandas().reset_index(drop=True)
    want = getattr(pdf, op)(2.0)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_frame_comparison_method_forms(frames):
    pdf, ldf = frames
    for op in ("eq", "ne", "lt", "le", "gt", "ge"):
        got = getattr(ldf, op)(3.0).to_pandas().reset_index(drop=True)
        want = getattr(pdf, op)(3.0)
        # round-9: frame comparisons match pandas on nulls too (NaN ne True,
        # everything else False) — fully differential per cell
        for c in ("a", "b"):
            assert got[c].tolist() == want[c].tolist(), (op, c)


def test_floored_modulo_operator(spark):
    ps = pd.Series([-7, 7, -7, 7, 5], dtype="int64")
    qs = pd.Series([3, 3, -3, -3, 2], dtype="int64")
    pdf = pd.DataFrame({"a": ps, "b": qs})
    ldf = lps.from_pandas(pdf, spark=spark)
    assert (ldf["a"] % ldf["b"]).to_pandas().tolist() == (ps % qs).tolist()
    assert (ldf["a"] % -3).to_pandas().tolist() == (ps % -3).tolist()
    assert (7 % ldf["b"]).to_pandas().tolist() == (7 % qs).tolist()
    assert ldf.mod(3)["a"].to_pandas().tolist() == pdf.mod(3)["a"].tolist()
    assert ldf.rmod(7)["b"].to_pandas().tolist() == pdf.rmod(7)["b"].tolist()
    pf = pd.Series([-7.5, 7.5, -7.5], dtype="float64")
    qf = pd.Series([2.0, -2.0, -2.0], dtype="float64")
    lf = lps.from_pandas(pd.DataFrame({"a": pf, "b": qf}), spark=spark)
    assert (lf["a"] % lf["b"]).to_pandas().tolist() == (pf % qf).tolist()


def test_aggregate_aliases(spark):
    pdf = pd.DataFrame({"k": ["x", "x", "y"], "v": [1.0, 2.0, 3.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = (
        ldf.groupby("k")
        .aggregate({"v": "sum"})
        .to_pandas()
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = pdf.groupby("k").aggregate({"v": "sum"}).reset_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ldf["v"].aggregate("sum") == pdf["v"].aggregate("sum")


def test_series_repeat(spark):
    ps = pd.Series([10, 20, 30], name="v")
    ldf = lps.from_pandas(ps.to_frame(), spark=spark)
    got = ldf["v"].repeat(3).to_pandas().reset_index(drop=True)
    want = ps.repeat(3).reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)
    with pytest.raises(ValueError):
        ldf["v"].repeat(-1)


def test_round6_stragglers(spark):
    pdf = pd.DataFrame(
        {"a": [1, 2, 3, 4], "b": ["x", "y", "x", "y"], "v": [10.0, 20.0, 30.0, 40.0]}
    )
    l = lps.from_pandas(pdf, spark=spark)
    assert l.keys() == list(pdf.keys())
    assert l.get("v").to_pandas().tolist() == pdf.get("v").tolist()
    assert l.get("nope", "dflt") == "dflt"

    r = l.set_index("a").rename_axis("idx").to_pandas()
    w = pdf.set_index("a").rename_axis("idx")
    assert r.index.name == w.index.name
    assert r["v"].tolist() == w["v"].tolist()

    l2 = lps.from_pandas(pdf, spark=spark).set_index(["b", "a"])
    p2 = pdf.set_index(["b", "a"])
    got = l2.xs("x", level="b").to_pandas()
    want = p2.xs("x", level="b")
    assert sorted(got.index.tolist()) == sorted(want.index.tolist())
    assert l2.swaplevel()._index == ("a", "b")
    with pytest.raises(ValueError):
        l.swaplevel()


def test_dot_products(spark):
    import numpy as np

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [4.0, 5.0, 6.0]})
    l = lps.from_pandas(pdf, spark=spark)
    assert abs(l["x"].dot(l["y"]) - pdf["x"].dot(pdf["y"])) < 1e-9
    rm = pd.DataFrame({"p": [0.5, -1.0], "q": [2.0, 0.25]}, index=["x", "y"])
    got = l.dot(rm).to_pandas().reset_index(drop=True)
    want = pdf.dot(rm).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        l.dot(pd.DataFrame({"p": [1.0]}, index=["zz"]))
