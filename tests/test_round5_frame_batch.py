"""Round-5 frame-level parity batch: reindex / memory_usage / info / compare
— differential vs pandas."""

import io

import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture()
def frames(spark):
    pdf = pd.DataFrame(
        {"k": ["a", "b", "c"], "x": [1.0, 2.0, 3.0], "y": ["p", "q", "r"]}
    )
    return pdf, lps.from_pandas(pdf, spark=spark)


def test_reindex_columns(frames):
    pdf, ldf = frames
    got = ldf.reindex(columns=["x", "z", "k"]).to_pandas()
    want = pdf.reindex(columns=["x", "z", "k"])
    assert got.columns.tolist() == want.columns.tolist()
    assert got["z"].isna().all()
    assert got["x"].tolist() == want["x"].tolist()


def test_reindex_index_order_and_missing(frames):
    pdf, ldf = frames
    got = ldf.set_index("k").reindex(index=["b", "a", "zz"]).to_pandas()
    want = pdf.set_index("k").reindex(index=["b", "a", "zz"])
    assert got.index.tolist() == want.index.tolist()
    assert got["x"].fillna(-1).tolist() == want["x"].fillna(-1).tolist()
    assert got["y"].fillna("?").tolist() == want["y"].fillna("?").tolist()


def test_reindex_index_fill_value(frames):
    pdf, ldf = frames
    got = ldf.set_index("k").reindex(index=["b", "zz"], fill_value=0).to_pandas()
    want = pdf.set_index("k").reindex(index=["b", "zz"], fill_value=0)
    assert got["x"].tolist() == want["x"].tolist()
    # string column: our typed-fill policy leaves nulls (pandas puts int 0
    # into the object column — no Spark representation); documented
    assert got["y"].isna().tolist() == [False, True]


def test_memory_usage_estimates(frames):
    pdf, ldf = frames
    mu = ldf.memory_usage()
    assert set(mu.index) == {"k", "x", "y"}
    assert mu["x"] == 3 * 8  # double
    assert mu["k"] > 0 and mu["y"] > 0


def test_info_prints_columns(frames):
    _, ldf = frames
    buf = io.StringIO()
    ldf.info(buf=buf)
    text = buf.getvalue()
    assert "total 3 columns" in text
    assert "3 non-null" in text


def test_compare_positional(frames):
    pdf, ldf = frames
    pdf2 = pdf.copy()
    pdf2.loc[1, "x"] = 99.0
    pdf2.loc[2, "y"] = "ZZ"
    l2 = lps.from_pandas(pdf2, spark=spark_of(ldf))
    got = ldf.compare(l2).to_pandas()
    want = pdf.compare(pdf2)
    assert len(got) == len(want)
    assert sorted(got["x_other"].fillna(-1)) == sorted(want[("x", "other")].fillna(-1))
    assert sorted(got["y_self"].fillna("?")) == sorted(want[("y", "self")].fillna("?"))


def spark_of(ldf):
    return ldf._sdf.sparkSession


def test_compare_identical_is_empty(frames):
    pdf, ldf = frames
    l2 = lps.from_pandas(pdf, spark=spark_of(ldf))
    assert ldf.compare(l2).to_pandas().empty
