"""Round-5: hypothesis fuzz of the str accessor over random Unicode-ish
strings (accents, CJK, digits of other scripts, empties, whitespace) —
differential vs pandas for the ops whose semantics live in our expressions
(slice, pad family, strip, zfill, case ops, startswith/endswith)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps

_ALPHABET = "abXY Zé漢١2³_-.|"

strings = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=8), min_size=1, max_size=8
)


def _both(spark, vals):
    pdf = pd.DataFrame({"s": vals})
    return pdf, lps.from_pandas(pdf, spark=spark)


@settings(max_examples=15, deadline=None)
@given(strings, st.integers(-5, 5), st.integers(-5, 5))
def test_str_slice_fuzz(spark, vals, start, stop):
    pdf, ldf = _both(spark, vals)
    got = ldf["s"].str.slice(start, stop).to_pandas().tolist()
    want = pdf["s"].str.slice(start, stop).tolist()
    assert got == want, (vals, start, stop)


@settings(max_examples=10, deadline=None)
@given(strings, st.integers(0, 10))
def test_str_pad_center_zfill_fuzz(spark, vals, width):
    pdf, ldf = _both(spark, vals)
    for meth, kwargs in [
        ("pad", {"width": width, "side": "left", "fillchar": "*"}),
        ("pad", {"width": width, "side": "right", "fillchar": "*"}),
        ("center", {"width": width, "fillchar": "*"}),
        ("zfill", {"width": width}),
    ]:
        got = getattr(ldf["s"].str, meth)(**kwargs).to_pandas().tolist()
        want = getattr(pdf["s"].str, meth)(**kwargs).tolist()
        assert got == want, (meth, vals, width)


@settings(max_examples=10, deadline=None)
@given(strings)
def test_str_case_strip_fuzz(spark, vals):
    pdf, ldf = _both(spark, vals)
    for meth in ("lower", "upper", "strip", "lstrip", "rstrip", "swapcase"):
        got = getattr(ldf["s"].str, meth)().to_pandas().tolist()
        want = getattr(pdf["s"].str, meth)().tolist()
        assert got == want, (meth, vals)


@settings(max_examples=10, deadline=None)
@given(strings, st.sampled_from(["a", "é", "漢", "X", ""]))
def test_str_startswith_endswith_contains_fuzz(spark, vals, pat):
    pdf, ldf = _both(spark, vals)
    for meth in ("startswith", "endswith"):
        got = getattr(ldf["s"].str, meth)(pat).to_pandas().tolist()
        want = getattr(pdf["s"].str, meth)(pat).tolist()
        assert got == want, (meth, vals, pat)
    got = ldf["s"].str.contains(pat, regex=False).to_pandas().tolist()
    want = pdf["s"].str.contains(pat, regex=False).tolist()
    assert got == want, ("contains", vals, pat)
