"""Hypothesis fuzz for stack/unstack round-trips vs real pandas (the last
reshape family without a property suite)."""
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legate_pandas_spark.frontend.frame import from_pandas


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(1, 8),
    ncols=st.integers(1, 4),
    data=st.data(),
)
def test_stack_matches_pandas(spark, n, ncols, data):
    cols = [f"c{i}" for i in range(ncols)]
    pdf = pd.DataFrame(
        {
            c: data.draw(
                st.lists(
                    st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 3)),
                    min_size=n,
                    max_size=n,
                )
            )
            for c in cols
        }
    )
    got = from_pandas(pdf, spark=spark).stack().to_pandas()
    exp = pdf.stack().reset_index()
    exp.columns = ["_row", "variable", "value"]
    # row-major order: variable sequence and values must match exactly
    assert got.reset_index()["variable"].tolist() == exp["variable"].tolist()
    assert np.allclose(got.reset_index()["value"].tolist(), exp["value"].tolist())


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=10),
    data=st.data(),
)
def test_unstack_single_value_matches_pandas(spark, keys, data):
    n = len(keys)
    sub = data.draw(
        st.lists(st.integers(0, 2), min_size=n, max_size=n)
    )
    vals = data.draw(
        st.lists(
            st.floats(-50, 50, allow_nan=False).map(lambda x: round(x, 3)),
            min_size=n,
            max_size=n,
        )
    )
    pdf = pd.DataFrame({"k": keys, "s": sub, "v": vals})
    # unique (k, s) index required for unstack
    pdf = pdf.drop_duplicates(["k", "s"])
    lp = from_pandas(pdf, spark=spark).set_index(["k", "s"]).unstack()
    exp = pdf.set_index(["k", "s"])["v"].unstack()
    got = lp.to_pandas()
    if got.index.name != "k":
        got = got.set_index("k")
    got = got.sort_index()
    exp = exp.sort_index()
    for c in exp.columns:
        g = got[str(c)].astype(float)
        e = exp[c].astype(float)
        ok = (np.isclose(g, e)) | (g.isna() & e.isna())
        assert bool(ok.all()), f"col {c}: {g.tolist()} vs {e.tolist()}"


def test_stack_then_unstack_roundtrip(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]})
    ldf = from_pandas(pdf, spark=spark)
    st_ = ldf.stack()
    # stack output is indexed by (row-implied, variable); values row-major
    vals = st_.to_pandas()["value"].tolist()
    assert vals == [1.0, 3.0, 2.0, 4.0]
