"""Round-8: hypothesis fuzz for the final breadth batch — Series
get/drop/searchsorted/asof/divmod and DataFrame asfreq/combine vs pandas."""
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legate_pandas_spark.frontend.frame import from_pandas

_vals = st.lists(
    st.one_of(st.none(), st.floats(-50, 50, allow_nan=False)), min_size=1, max_size=12
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_vals, label=st.integers(-2, 14))
def test_fuzz_series_get_default_index(spark, vals, label):
    pdf = pd.DataFrame({"v": pd.array(vals, dtype="float64")})
    s = from_pandas(pdf, spark=spark)["v"]
    e = pdf["v"].get(label, "MISSING")
    g = s.get(label, "MISSING")
    if isinstance(e, str):
        assert g == e
    elif pd.isna(e):
        assert g is None or pd.isna(g)
    else:
        assert g == e


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_vals, drop_pos=st.integers(0, 11))
def test_fuzz_series_drop_position_labels(spark, vals, drop_pos):
    pdf = pd.DataFrame({"v": pd.array(vals, dtype="float64")})
    s = from_pandas(pdf, spark=spark)["v"]
    if drop_pos >= len(vals):
        with pytest.raises(KeyError):
            s.drop(drop_pos)
        return
    exp = pdf["v"].drop(drop_pos)
    got = s.drop(drop_pos).to_pandas()
    assert [int(i) for i in got.index] == list(exp.index)
    for g, e in zip(got, exp):
        assert (pd.isna(g) and pd.isna(e)) or g == e


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1, max_size=12),
    probes=st.lists(st.floats(-60, 60, allow_nan=False), min_size=1, max_size=4),
    side=st.sampled_from(["left", "right"]),
)
def test_fuzz_searchsorted(spark, vals, probes, side):
    vals = sorted(vals)
    pdf = pd.DataFrame({"v": vals})
    s = from_pandas(pdf, spark=spark)["v"]
    exp = pdf["v"].searchsorted(probes, side=side)
    got = s.searchsorted(probes, side=side)
    assert got.tolist() == list(exp)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    kv=st.lists(
        st.tuples(st.integers(0, 20), st.one_of(st.none(), st.floats(-50, 50, allow_nan=False))),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    where=st.integers(-1, 22),
)
def test_fuzz_series_asof(spark, kv, where):
    kv = sorted(kv)
    pdf = pd.DataFrame({"k": [k for k, _ in kv], "v": pd.array([v for _, v in kv], dtype="float64")})
    ps = pdf.set_index("k")["v"]
    s = from_pandas(pdf, spark=spark).set_index("k")["v"]
    e, g = ps.asof(where), s.asof(where)
    assert (pd.isna(e) and pd.isna(g)) or e == g


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.lists(st.floats(-20, 20, allow_nan=False), min_size=1, max_size=8),
    b=st.lists(st.sampled_from([-3.0, -1.0, 2.0, 5.0]), min_size=1, max_size=8),
)
def test_fuzz_divmod(spark, a, b):
    n = min(len(a), len(b))
    pdf = pd.DataFrame({"a": a[:n], "b": b[:n]})
    df = from_pandas(pdf, spark=spark)
    q, r = divmod(df["a"], df["b"])
    eq, er = divmod(pdf["a"], pdf["b"])
    for g, e in zip(q.to_pandas(), eq):
        assert abs(g - e) < 1e-9
    for g, e in zip(r.to_pandas(), er):
        assert abs(g - e) < 1e-9


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    mins=st.lists(st.integers(0, 600), min_size=1, max_size=10, unique=True),
    freq=st.sampled_from(["1h", "30min", "2h"]),
)
def test_fuzz_asfreq(spark, mins, freq):
    base = pd.Timestamp("2024-05-01")
    pdf = pd.DataFrame(
        {
            "t": [base + pd.Timedelta(minutes=m) for m in sorted(mins)],
            "v": np.arange(len(mins), dtype="float64"),
        }
    )
    exp = pdf.set_index("t").asfreq(freq)
    got = from_pandas(pdf, spark=spark).set_index("t").asfreq(freq).to_pandas()
    assert [pd.Timestamp(x) for x in got.index] == list(exp.index)
    for g, e in zip(got["v"], exp["v"]):
        assert (pd.isna(g) and pd.isna(e)) or g == e


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.lists(st.one_of(st.none(), st.floats(-20, 20, allow_nan=False)), min_size=1, max_size=8),
    b=st.lists(st.one_of(st.none(), st.floats(-20, 20, allow_nan=False)), min_size=1, max_size=8),
)
def test_fuzz_frame_combine_unequal_lengths(spark, a, b):
    pdf1 = pd.DataFrame({"A": pd.array(a, dtype="float64")})
    pdf2 = pd.DataFrame({"A": pd.array(b, dtype="float64")})
    exp = pdf1.combine(pdf2, lambda s1, s2: s1.where(s1 > s2, s2))
    got = (
        from_pandas(pdf1, spark=spark)
        .combine(
            from_pandas(pdf2, spark=spark), lambda s1, s2: s1.where(s1 > s2, s2)
        )
        .to_pandas()
    )
    assert len(got) == len(exp)
    for g, e in zip(got["A"], exp["A"]):
        assert (pd.isna(g) and pd.isna(e)) or abs(g - e) < 1e-9
