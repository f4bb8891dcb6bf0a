"""Categorical as a modeled dtype — differential vs real pandas (reference
tests/pandas/sr_astype_category.py, sr_fillna_category.py,
sr_sort_values_category.py, df_merge_category.py; dtype machinery
common/types.py:135-190, replicated dictionary core/column.py:1300-1341).

Physical storage stays StringType (SURVEY §1.1); CatMeta carries the logical
dictionary — declared lists compile into expressions (no collect), inferred
domains broadcast-join a lazy rank dictionary."""

import pandas as pd
import pytest

import legate_pandas_spark as lps


def _series_equal(got: pd.Series, want: pd.Series, sort: bool = True):
    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    if sort:
        got = got.sort_values(key=lambda s: s.astype(str)).reset_index(drop=True)
        want = want.sort_values(key=lambda s: s.astype(str)).reset_index(drop=True)
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_astype_category_roundtrip(spark):
    # mirror of sr_astype_category.py
    strs = ["b", "C", "a", "b", "B", "c", "a", "C", "d", "b"]
    pdf = pd.DataFrame({"c": strs})
    ldf = lps.from_pandas(pdf, spark=spark)

    got = ldf["c"].astype("category").to_pandas()
    want = pdf["c"].astype("category")
    _series_equal(got, want)
    assert got.dtype == want.dtype  # identical inferred dictionaries

    cat = pd.CategoricalDtype(["b", "c", "B", "C"])
    got2 = ldf["c"].astype(cat).to_pandas()
    want2 = pdf["c"].astype(cat)  # out-of-dictionary values → NaN
    _series_equal(got2, want2)
    assert got2.dtype == cat

    # astype('category') on an already-categorical column is a no-op
    s = ldf["c"].astype(cat).astype("category")
    assert s._cat.categories == list(cat.categories)

    # round-trip back to string
    got3 = ldf["c"].astype("category").astype("string").to_pandas()
    _series_equal(got3, pdf["c"], sort=True)
    assert got3.dtype == object


def test_fillna_category(spark):
    # mirror of sr_fillna_category.py
    pdf = pd.DataFrame({"c": pd.Series(["a", "b", "c", None, "d", "e", None])})
    ldf = lps.from_pandas(pdf, spark=spark)
    cat = pd.CategoricalDtype(["a", "b", "c", "d", "e"])
    got = ldf["c"].astype(cat).fillna("e").to_pandas()
    want = pdf["c"].astype(cat).fillna("e")
    _series_equal(got, want)

    with pytest.raises(TypeError):
        ldf["c"].astype(cat).fillna("zz")  # new category: pandas raises


def test_sort_values_category_ordered(spark):
    # mirror of sr_sort_values_category.py: order = declared dictionary order
    cat = pd.CategoricalDtype(list("BCAD"), ordered=True)
    vals = ["A", "D", "B", "C", "A", None, "B", "D", "C", None, "A"]
    pdf = pd.DataFrame({"c": vals})
    ldf = lps.from_pandas(pdf, spark=spark)
    for ascending in (True, False):
        got = ldf["c"].astype(cat).sort_values(ascending=ascending).to_pandas()
        want = pdf["c"].astype(cat).sort_values(ascending=ascending, ignore_index=True)
        _series_equal(got, want, sort=False)


def test_merge_category_key(spark):
    # mirror of df_merge_category.py: categorical join keys, inner and left
    n = 15
    categories = sorted("C" + str(i) for i in range(n // 3 + 1))
    key_dtype = pd.CategoricalDtype(categories=categories)
    key_left = pd.Categorical.from_codes(
        [x for x in range(n // 3 - 1, -1, -1) for _ in range(3)], dtype=key_dtype
    )
    key_right = pd.Categorical.from_codes(list(range(n // 3)), dtype=key_dtype)
    df1 = pd.DataFrame({"c1": [float(i) for i in range(n)], "key": key_left})
    df2 = pd.DataFrame({"c2": [float(i) * 10 for i in range(n // 3)], "key": key_right})
    l1 = lps.from_pandas(df1, spark=spark)
    l2 = lps.from_pandas(df2, spark=spark)
    assert l1._cat_meta["key"].categories == categories  # meta survives ingest

    for how in ("inner", "left"):
        got = l1.merge(l2, on="key", how=how)
        assert got._cat_meta["key"].categories == categories  # dtype survives merge
        gp = got.to_pandas()
        want = df1.merge(df2, on="key", how=how)
        want["key"] = want["key"].astype(object)
        gp["key"] = gp["key"].astype(object)
        gp = gp.sort_values(list(gp.columns)).reset_index(drop=True)
        want = want[gp.columns].sort_values(list(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(gp, want, check_dtype=False)


def test_frame_astype_category_and_codes(spark):
    pdf = pd.DataFrame({"k": ["x", "y", "x", "z", "y"], "v": [1, 2, 3, 4, 5]})
    ldf = lps.from_pandas(pdf, spark=spark)
    cast = ldf.astype({"k": "category"})
    assert cast._cat_meta["k"] is not None
    out = cast.to_pandas()
    assert isinstance(out["k"].dtype, pd.CategoricalDtype)

    # declared-dictionary codes: pure expression, no join, no collect
    cat = pd.CategoricalDtype(["z", "y", "x"])
    s = ldf["k"].astype(cat).cat.codes
    got = s.to_pandas().tolist()
    want = pdf["k"].astype(cat).cat.codes.tolist()
    assert sorted(got) == sorted(want)


def test_declared_codes_plan_has_no_join(spark):
    """Declared dictionaries are user-supplied — codes must compile to a plain
    expression (array_position), not a join or a collected CASE chain."""
    pdf = pd.DataFrame({"k": ["x", "y", "x", "z", "y"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    s = ldf["k"].astype(pd.CategoricalDtype(["x", "y", "z"])).cat.codes
    plan = s._frame._sdf.select(s._col)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_sort_values_frame_categorical_key(spark):
    cat = pd.CategoricalDtype(["small", "medium", "large"], ordered=True)
    pdf = pd.DataFrame(
        {"size": ["large", "small", "medium", "large", "small"], "v": [1, 2, 3, 4, 5]}
    )
    ldf = lps.from_pandas(pdf, spark=spark).astype({"size": cat})
    got = ldf.sort_values("size").to_pandas().reset_index(drop=True)
    want = pdf.astype({"size": cat}).sort_values("size").reset_index(drop=True)
    assert got["size"].astype(str).tolist() == want["size"].astype(str).tolist()


def test_cat_dictionary_mutators_match_pandas(spark):
    """Round-9: add/remove/rename/reorder_categories, as_ordered/unordered,
    remove_unused_categories — differential vs real pandas (values AND
    resulting dtype)."""
    strs = ["b", "a", "c", "b", None, "a"]
    pdf = pd.DataFrame({"c": strs})
    ldf = lps.from_pandas(pdf, spark=spark)
    lcat = ldf["c"].astype("category")
    pcat = pdf["c"].astype("category")

    got = lcat.cat.add_categories(["z", "y"]).to_pandas()
    want = pcat.cat.add_categories(["z", "y"])
    _series_equal(got, want)
    assert got.dtype == want.dtype

    got = lcat.cat.remove_categories("b").to_pandas()
    want = pcat.cat.remove_categories("b")
    _series_equal(got, want)
    assert got.dtype == want.dtype

    got = lcat.cat.rename_categories({"a": "alpha", "c": "gamma"}).to_pandas()
    want = pcat.cat.rename_categories({"a": "alpha", "c": "gamma"})
    _series_equal(got, want)
    assert got.dtype == want.dtype

    got = lcat.cat.rename_categories(["x", "y", "z"]).to_pandas()
    want = pcat.cat.rename_categories(["x", "y", "z"])
    _series_equal(got, want)
    assert got.dtype == want.dtype

    got = lcat.cat.reorder_categories(["c", "a", "b"], ordered=True).to_pandas()
    want = pcat.cat.reorder_categories(["c", "a", "b"], ordered=True)
    _series_equal(got, want)
    assert got.dtype == want.dtype
    assert lcat.cat.reorder_categories(["c", "a", "b"], ordered=True).cat.ordered

    ordered = lcat.cat.as_ordered()
    assert ordered.cat.ordered and not ordered.cat.as_unordered().cat.ordered

    # unused category dropped, used ones kept
    declared = lcat.cat.add_categories("zz")
    got = declared.cat.remove_unused_categories().to_pandas()
    want = pcat.cat.add_categories("zz").cat.remove_unused_categories()
    _series_equal(got, want)
    assert got.dtype == want.dtype

    # error modes match pandas
    with pytest.raises(ValueError, match="must not include old"):
        lcat.cat.add_categories("a")
    with pytest.raises(ValueError):
        pcat.cat.add_categories("a")
    with pytest.raises(ValueError, match="in old categories"):
        lcat.cat.remove_categories("nope")
    with pytest.raises(ValueError):
        pcat.cat.remove_categories("nope")
    with pytest.raises(ValueError, match="not the same as"):
        lcat.cat.reorder_categories(["a", "b"])
    with pytest.raises(ValueError):
        pcat.cat.reorder_categories(["a", "b"])
    with pytest.raises(ValueError, match="unique"):
        lcat.cat.rename_categories(["x", "x", "y"])
    with pytest.raises(ValueError):
        pcat.cat.rename_categories(["x", "x", "y"])
