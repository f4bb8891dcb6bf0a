"""Round-8 final breadth batch — differential vs pandas:
Series get/xs/drop/squeeze/add_prefix/add_suffix/divmod/rdivmod/nbytes/
memory_usage/searchsorted/asof/at_time/between_time/len,
DataFrame isetitem/infer_objects/combine/asfreq."""
import numpy as np
import pandas as pd
import pytest

from legate_pandas_spark.frontend.frame import from_pandas


@pytest.fixture()
def sdf(spark):
    pdf = pd.DataFrame({"v": [10.0, None, 30.0, 40.0]})
    return pdf["v"], from_pandas(pdf, spark=spark)["v"]


def test_series_get_xs(spark):
    pdf = pd.DataFrame({"k": ["a", "b", "c"], "v": [1.0, 2.0, 3.0]})
    s = from_pandas(pdf, spark=spark).set_index("k")["v"]
    ps = pdf.set_index("k")["v"]
    assert s.get("b") == ps.get("b") == 2.0
    assert s.get("zz", -1.0) == ps.get("zz", -1.0) == -1.0
    assert s.get("zz") is None and ps.get("zz") is None
    assert s.xs("c") == ps.xs("c") == 3.0
    with pytest.raises(KeyError):
        s.xs("zz")
    # default RangeIndex: labels are positions
    s2 = from_pandas(pdf, spark=spark)["v"]
    assert s2.get(1) == pdf["v"].get(1) == 2.0
    assert s2.get(99, 0.0) == pdf["v"].get(99, 0.0) == 0.0


def test_series_drop(spark):
    pdf = pd.DataFrame({"v": [10.0, 20.0, 30.0]})
    s = from_pandas(pdf, spark=spark)["v"]
    exp = pdf["v"].drop(1)
    got = s.drop(1).to_pandas()
    assert got.tolist() == exp.tolist()
    assert [int(i) for i in got.index] == list(exp.index)  # labels [0, 2] kept
    with pytest.raises(KeyError):
        s.drop(99)
    # stored string index
    pdf2 = pd.DataFrame({"k": ["a", "b", "c"], "v": [1.0, 2.0, 3.0]})
    s2 = from_pandas(pdf2, spark=spark).set_index("k")["v"]
    exp2 = pdf2.set_index("k")["v"].drop(["a", "c"])
    got2 = s2.drop(["a", "c"]).to_pandas()
    assert got2.tolist() == exp2.tolist()
    assert list(got2.index) == list(exp2.index)


def test_series_squeeze_len_bool(spark):
    pdf = pd.DataFrame({"v": [7.0]})
    s = from_pandas(pdf, spark=spark)["v"]
    assert s.squeeze() == pdf["v"].squeeze() == 7.0
    pdf3 = pd.DataFrame({"v": [1.0, 2.0]})
    s3 = from_pandas(pdf3, spark=spark)["v"]
    assert len(s3) == len(pdf3["v"]) == 2
    assert s3.squeeze().to_pandas().tolist() == [1.0, 2.0]
    with pytest.raises(ValueError):
        bool(s3)


def test_series_add_prefix_suffix(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0]})
    s = from_pandas(pdf, spark=spark)["v"]
    exp = pdf["v"].add_prefix("p_")
    got = s.add_prefix("p_").to_pandas()
    assert got.tolist() == exp.tolist()
    assert list(got.index) == list(exp.index)  # ['p_0', 'p_1']
    exp2 = pdf["v"].add_suffix("_s")
    got2 = s.add_suffix("_s").to_pandas()
    assert list(got2.index) == list(exp2.index)


def test_series_divmod(spark):
    pdf = pd.DataFrame({"a": [7.0, -7.0, 9.0], "b": [3.0, 3.0, -2.0]})
    df = from_pandas(pdf, spark=spark)
    q, r = divmod(df["a"], df["b"])
    eq, er = divmod(pdf["a"], pdf["b"])
    assert q.to_pandas().tolist() == eq.tolist()
    assert r.to_pandas().tolist() == er.tolist()
    q2, r2 = df["a"].rdivmod(10.0)
    eq2, er2 = pdf["a"].rdivmod(10.0)
    assert q2.to_pandas().tolist() == eq2.tolist()
    assert r2.to_pandas().tolist() == er2.tolist()


def test_series_nbytes_memory_usage(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0]})
    s = from_pandas(pdf, spark=spark)["v"]
    assert s.nbytes == pdf["v"].nbytes == 24
    assert s.memory_usage() == pdf["v"].memory_usage() == 156
    assert s.memory_usage(index=False) == pdf["v"].memory_usage(index=False) == 24
    pdf2 = pd.DataFrame({"k": ["x", "y"], "v": [1.0, 2.0]}).set_index("k")
    s2 = from_pandas(pdf2.reset_index(), spark=spark).set_index("k")["v"]
    assert s2.memory_usage() == pdf2["v"].memory_usage() == 32


def test_series_searchsorted(spark):
    vals = [1.0, 3.0, 3.0, 5.0, 9.0]
    pdf = pd.DataFrame({"v": vals})
    s = from_pandas(pdf, spark=spark)["v"]
    for probe in [0.0, 3.0, 6.0, 10.0]:
        for side in ["left", "right"]:
            assert s.searchsorted(probe, side=side) == int(
                pdf["v"].searchsorted(probe, side=side)
            ), (probe, side)
    got = s.searchsorted([2.0, 3.0], side="left")
    exp = pdf["v"].searchsorted([2.0, 3.0], side="left")
    assert got.tolist() == list(exp)


def test_series_asof(spark):
    pdf = pd.DataFrame({"k": [1, 3, 5, 7], "v": [10.0, None, 30.0, None]})
    ps = pdf.set_index("k")["v"]
    s = from_pandas(pdf, spark=spark).set_index("k")["v"]
    for w in [0, 1, 4, 6, 8]:
        e, g = ps.asof(w), s.asof(w)
        if pd.isna(e):
            assert pd.isna(g), w
        else:
            assert g == e, w


def test_series_at_time_between_time(spark):
    ts = pd.date_range("2024-01-01", periods=8, freq="3h")
    pdf = pd.DataFrame({"t": ts, "v": np.arange(8.0)})
    ps = pdf.set_index("t")["v"]
    s = from_pandas(pdf, spark=spark).set_index("t")["v"]
    assert s.at_time("06:00").to_pandas().tolist() == ps.at_time("06:00").tolist()
    assert (
        s.between_time("03:00", "09:00").to_pandas().tolist()
        == ps.between_time("03:00", "09:00").tolist()
    )


def test_frame_isetitem_infer_objects(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    df = from_pandas(pdf, spark=spark)
    df.isetitem(1, 9.0)
    pdf.isetitem(1, 9.0)
    assert df.to_pandas()["b"].tolist() == pdf["b"].tolist()
    out = df.infer_objects()
    assert out.to_pandas()["a"].tolist() == pdf.infer_objects()["a"].tolist()


def test_frame_combine(spark):
    pdf1 = pd.DataFrame({"a": [1.0, 8.0], "b": [5.0, 2.0]})
    pdf2 = pd.DataFrame({"a": [3.0, 4.0], "b": [1.0, 9.0]})
    take_bigger = lambda s1, s2: s1.where(s1 > s2, s2)  # noqa: E731
    exp = pdf1.combine(pdf2, lambda s1, s2: s1.where(s1 > s2, s2))
    got = (
        from_pandas(pdf1, spark=spark)
        .combine(from_pandas(pdf2, spark=spark), take_bigger)
        .to_pandas()
    )
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist(), c
    # fill_value + a one-sided column
    pdf3 = pd.DataFrame({"a": [1.0, None], "c": [7.0, 8.0]})
    exp2 = pdf1.combine(pdf3, lambda s1, s2: s1.where(s1 > s2, s2), fill_value=0.0)
    got2 = (
        from_pandas(pdf1, spark=spark)
        .combine(from_pandas(pdf3, spark=spark), take_bigger, fill_value=0.0)
        .to_pandas()
    )
    assert sorted(got2.columns) == sorted(exp2.columns)
    for c in exp2.columns:
        ge, ee = got2[c], exp2[c]
        for g, e in zip(ge, ee):
            if pd.isna(e):
                assert pd.isna(g), c
            else:
                assert g == e, c


def test_frame_asfreq(spark):
    ts = [
        pd.Timestamp("2024-01-01 00:00"),
        pd.Timestamp("2024-01-01 02:00"),
        pd.Timestamp("2024-01-01 03:30"),  # off-grid: drops at 1h grid
        pd.Timestamp("2024-01-01 05:00"),
    ]
    pdf = pd.DataFrame({"t": ts, "v": [1.0, 2.0, 3.0, 4.0]})
    exp = pdf.set_index("t").asfreq("1h")
    got = (
        from_pandas(pdf, spark=spark)
        .set_index("t")
        .asfreq("1h")
        .to_pandas()
    )
    assert [pd.Timestamp(x) for x in got.index] == list(exp.index)
    for g, e in zip(got["v"], exp["v"]):
        if pd.isna(e):
            assert pd.isna(g)
        else:
            assert g == e


def test_frame_combine_outer_union_alignment(spark):
    take_bigger = lambda s1, s2: s1.where(s1 > s2, s2)  # noqa: E731
    # unequal lengths on default indexes: pandas pads the shorter side
    pdf1 = pd.DataFrame({"A": [1.0, 2.0]})
    pdf2 = pd.DataFrame({"A": [3.0, 4.0, 5.0]})
    exp = pdf1.combine(pdf2, lambda a, b: a.where(a > b, b))
    got = (
        from_pandas(pdf1, spark=spark)
        .combine(from_pandas(pdf2, spark=spark), take_bigger)
        .to_pandas()
    )
    assert len(got) == len(exp) == 3
    for g, e in zip(got["A"], exp["A"]):
        if pd.isna(e):
            assert pd.isna(g)
        else:
            assert g == e
    # labeled frames: union of labels, sorted
    p1 = pd.DataFrame({"A": [1.0, 9.0]}, index=["a", "c"])
    p2 = pd.DataFrame({"A": [5.0, 2.0]}, index=["b", "c"])
    exp2 = p1.combine(p2, lambda a, b: a.where(a > b, b))
    l1 = from_pandas(p1.reset_index(names="k"), spark=spark).set_index("k")
    l2 = from_pandas(p2.reset_index(names="k"), spark=spark).set_index("k")
    got2 = l1.combine(l2, take_bigger).to_pandas()
    assert list(got2.index) == list(exp2.index)
    for g, e in zip(got2["A"], exp2["A"]):
        if pd.isna(e):
            assert pd.isna(g)
        else:
            assert g == e
    # mixed labeled/default raises
    with pytest.raises(NotImplementedError):
        l1.combine(from_pandas(pdf1, spark=spark), take_bigger)


def test_frame_isetitem_rejects_arrays(spark):
    df = from_pandas(pd.DataFrame({"a": [1.0], "b": [2.0]}), spark=spark)
    with pytest.raises(TypeError):
        df.isetitem([0, 1], np.array([[1, 2]]))
    df.isetitem([0, 1], [7.0, 8.0])
    assert df.to_pandas().iloc[0].tolist() == [7.0, 8.0]


def test_frame_asfreq_duplicate_labels_raise(spark):
    ts = [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-01")]
    pdf = pd.DataFrame({"t": ts, "v": [1.0, 2.0]})
    with pytest.raises(ValueError, match="duplicate"):
        from_pandas(pdf, spark=spark).set_index("t").asfreq("1h")


def test_dsir_score_stream_exprs_null_text_scores_zero(spark):
    """The stream scorer's expressions (run in batch mode here) must score a
    null-text document 0, like the batch scorer's coalesce'd sum."""
    from legate_pandas_spark.streaming.documents import dsir_score_stream

    sdf = spark.createDataFrame(
        [(1, "spark join merge"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_score_stream(sdf, {0: 5}, 7).collect()}
    assert rows[2]["logw_micro"] == 0
    assert rows[3]["logw_micro"] == 0
    assert rows[2]["score_micro"] is not None


def test_reset_index_materializes_default_index(spark):
    pdf = pd.DataFrame({"a": [10.0, 20.0, 30.0]})
    exp = pdf.reset_index()
    got = from_pandas(pdf, spark=spark).reset_index().to_pandas()
    assert list(got.columns) == list(exp.columns) == ["index", "a"]
    assert got["index"].tolist() == exp["index"].tolist() == [0, 1, 2]
    # name collision falls back to level_0 (pandas)
    pdf2 = pd.DataFrame({"index": [1.0], "a": [2.0]})
    got2 = from_pandas(pdf2, spark=spark).reset_index().to_pandas()
    assert "level_0" in got2.columns
    # Series.reset_index(drop=False) -> DataFrame with the index column
    s = from_pandas(pdf, spark=spark)["a"]
    exp_s = pdf["a"].reset_index()
    got_s = s.reset_index().to_pandas()
    assert list(got_s.columns) == list(exp_s.columns) == ["index", "a"]


def test_series_combine_scalar_func(spark):
    pdf = pd.DataFrame({"a": [1.0, 8.0, None], "b": [3.0, 2.0, 5.0]})
    df = from_pandas(pdf, spark=spark)
    exp = pdf["a"].combine(pdf["b"], max)
    got = df["a"].combine(df["b"], max).to_pandas()
    for g, e in zip(got, exp):
        if pd.isna(e):
            assert pd.isna(g)
        else:
            assert g == e
    # fill_value applies only to index-misaligned holes (none under
    # same-frame alignment): NaN values pass through func exactly like pandas
    exp2 = pdf["a"].combine(pdf["b"], lambda x, y: x * 10 + y, fill_value=0.0)
    got2 = df["a"].combine(df["b"], lambda x, y: x * 10 + y, fill_value=0.0).to_pandas()
    for g, e in zip(got2, exp2):
        assert (pd.isna(g) and pd.isna(e)) or g == e
    # string-returning func keeps strings
    got3 = df["a"].combine(df["b"], lambda x, y: "hi" if (x or 0) > y else "lo").to_pandas()
    exp3 = pdf["a"].combine(pdf["b"], lambda x, y: "hi" if (x or 0) > y else "lo")
    # pandas passes NaN through func; (NaN or 0) is NaN -> NaN > y is False -> 'lo'
    assert got3.tolist() == exp3.tolist()


def test_frame_asof_scalar(spark):
    pdf = pd.DataFrame(
        {"k": [1, 3, 5, 7], "x": [10.0, None, 30.0, 40.0], "y": [1.0, 2.0, None, 4.0]}
    )
    pidx = pdf.set_index("k")
    df = from_pandas(pdf, spark=spark).set_index("k")
    for w in [0, 1, 4, 6, 9]:
        e, g = pidx.asof(w), df.asof(w)
        assert list(g.index) == list(e.index)
        for c in e.index:
            if pd.isna(e[c]):
                assert pd.isna(g[c]), (w, c)
            else:
                assert g[c] == e[c], (w, c)
