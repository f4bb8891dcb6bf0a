"""Direct numpy interop (reference tests/interop/sr_from_numpy.py,
sr_to_numpy.py, df_from_numpy.py; core/runtime.py:531-758 store<->ndarray
mapping). Spark-side: ndarray -> Arrow -> DataFrame on the way in,
toPandas().to_numpy() on the way out."""

import numpy as np
import pandas as pd

import legate_pandas_spark as lps


def test_series_from_numpy_equals(spark):
    rng = np.random.RandomState(42)
    x = rng.random(1000)
    s = pd.Series(x)
    ls = lps.Series(x)
    assert ls.equals(lps.Series(s))


def test_series_from_numpy_int(spark):
    x = np.arange(50, dtype=np.int64)
    ls = lps.Series(x)
    got = ls.to_pandas().sort_values().reset_index(drop=True)
    pd.testing.assert_series_equal(got, pd.Series(x), check_names=False)


def test_series_to_numpy_roundtrip(spark):
    s1 = lps.Series([1, 2, 3])
    arr1 = np.array(s1)
    assert np.array_equal(np.sort(arr1), np.array([1, 2, 3]))
    arr2 = s1.to_numpy()
    assert np.array_equal(np.sort(arr2), np.array([1, 2, 3]))


def test_series_equals_negative(spark):
    a = lps.Series([1, 2, 3])
    b = lps.Series([1, 2, 4])
    c = lps.Series([1, 2])
    assert not a.equals(b)
    assert not a.equals(c)
    assert not a.equals(lps.Series([1.0, 2.0, 3.0]))  # dtype mismatch


def test_series_equals_nan(spark):
    a = lps.Series([1.0, np.nan, 3.0])
    b = lps.Series([1.0, np.nan, 3.0])
    assert a.equals(b)


def test_dataframe_from_numpy_dict(spark):
    rng = np.random.RandomState(7)
    x, y = rng.random(10), rng.random(10)
    pdf = pd.DataFrame({"x": x, "y": y})
    ldf1 = lps.DataFrame({"x": x, "y": y}, spark=spark)
    ldf3 = lps.DataFrame(ldf1)
    assert ldf1.equals(lps.DataFrame(pdf, spark=spark))
    assert ldf3.equals(lps.DataFrame(pdf, spark=spark))


def test_dataframe_to_numpy(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]})
    ldf = lps.DataFrame(pdf, spark=spark)
    arr = ldf.to_numpy()
    assert arr.shape == (2, 2)
    got = arr[np.lexsort(arr.T[::-1])]
    want = pdf.to_numpy()
    assert np.allclose(got, want[np.lexsort(want.T[::-1])])
