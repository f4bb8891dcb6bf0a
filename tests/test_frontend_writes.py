"""Frame-shaped where/mask with alignment, scalar at/iat/loc writes, and row
drops by label — differential vs real pandas (reference tests/pandas/df_where.py,
df_mask.py, df_at.py, df_iat.py, df_drop.py; copy_if_else
frontend/dataframe.py:478-573; write_at core/table.py:697-762; row drop
frontend/frame.py:614-710)."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


def _match(lps_df, pandas_df, sort=True):
    got = lps_df.to_pandas()
    if got.index.name or isinstance(got.index, pd.MultiIndex):
        got = got.reset_index()
        pandas_df = pandas_df.reset_index()
    got = got[list(pandas_df.columns)]
    if sort:
        got = got.sort_values(list(got.columns)).reset_index(drop=True)
        pandas_df = pandas_df.sort_values(list(pandas_df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pandas_df, check_dtype=False)


@pytest.fixture()
def dfs(spark):
    pdf = pd.DataFrame({"c1": list(range(20)), "c2": [1234] * 20})
    return lps.from_pandas(pdf, spark=spark), pdf


# ---- df_where.py / df_mask.py shapes ---------------------------------------


def test_where_series_cond_scalar_other(dfs):
    ldf, pdf = dfs
    _match(ldf.where(ldf["c1"] % 2 == 0, 9999), pdf.where(pdf.c1 % 2 == 0, 9999))


def test_where_series_cond_nan_fill(dfs):
    ldf, pdf = dfs
    got = ldf.where(ldf["c1"] % 2 == 0).fillna(9999.0).astype(np.int64)
    want = pdf.where(pdf.c1 % 2 == 0).fillna(9999.0).astype(np.int64)
    _match(got, want)


def test_where_series_other_axis0(dfs):
    ldf, pdf = dfs
    got = ldf.where(ldf["c1"] % 2 == 0, ldf["c2"], axis=0)
    want = pdf.where(pdf.c1 % 2 == 0, pdf.c2, axis=0)
    _match(got, want)


def test_where_frame_other(dfs):
    ldf, pdf = dfs
    got = ldf.where(ldf["c1"] % 2 == 0, ldf)  # other = self (aligned)
    want = pdf.where(pdf.c1 % 2 == 0, pdf)
    _match(got, want)


def test_where_frame_cond_frame_other(dfs):
    ldf, pdf = dfs
    got = ldf.where(ldf % 2 == 0, -ldf)  # lineage-aligned derived frames
    want = pdf.where(pdf % 2 == 0, -pdf)
    _match(got, want)


def test_mask_shapes(dfs):
    ldf, pdf = dfs
    _match(ldf.mask(ldf["c1"] % 2 == 0, 9999), pdf.mask(pdf.c1 % 2 == 0, 9999))
    got = ldf.mask(ldf["c1"] % 2 == 0).fillna(9999.0).astype(np.int64)
    want = pdf.mask(pdf.c1 % 2 == 0).fillna(9999.0).astype(np.int64)
    _match(got, want)
    _match(
        ldf.mask(ldf["c1"] % 2 == 0, ldf["c2"], axis=0),
        pdf.mask(pdf.c1 % 2 == 0, pdf.c2, axis=0),
    )
    _match(ldf.mask(ldf % 3 == 1, ldf * 10), pdf.mask(pdf % 3 == 1, pdf * 10))


def test_where_unaligned_raises(spark, dfs):
    ldf, _ = dfs
    other = lps.from_pandas(pd.DataFrame({"c1": [0] * 20, "c2": [0] * 20}), spark=spark)
    with pytest.raises(ValueError):
        ldf.where(ldf % 2 == 0, other)


# ---- df_at.py / df_iat.py write shapes -------------------------------------


def test_at_write(spark):
    pdf = pd.DataFrame({"a": range(10), "b": range(1, 11), "c": [str(i) * 3 for i in range(10)]})
    ldf = lps.from_pandas(pdf, spark=spark).set_index("a")
    want = pdf.set_index("a")
    for label, col, val in [(3, "b", 100), (5, "c", "5678")]:
        ldf.at[label, col] = val
        want.at[label, col] = val
        assert ldf.at[label, col] == want.at[label, col]
    _match(ldf.reset_index(), want.reset_index())


def test_iat_write(spark):
    pdf = pd.DataFrame({"a": list(range(10)), "b": [float(i) for i in range(10)]})
    ldf = lps.from_pandas(pdf, spark=spark)
    want = pdf.copy()
    ldf.iat[3, 0] = 100
    want.iat[3, 0] = 100
    ldf.iat[7, 1] = -1.5
    want.iat[7, 1] = -1.5
    assert ldf.iat[3, 0] == want.iat[3, 0]
    assert ldf.iat[7, 1] == want.iat[7, 1]
    _match(ldf, want)


def test_loc_label_write(spark):
    pdf = pd.DataFrame({"k": range(10), "v": [float(i) for i in range(10)]})
    ldf = lps.from_pandas(pdf, spark=spark).set_index("k")
    want = pdf.set_index("k")
    ldf.loc[4, "v"] = -9.0
    want.loc[4, "v"] = -9.0
    _match(ldf.reset_index(), want.reset_index())


# ---- df_drop.py row-drop shapes --------------------------------------------


def test_drop_rows_single_index(spark):
    pdf = pd.DataFrame({"k": range(10), "v": list("abcdefghij")})
    ldf = lps.from_pandas(pdf, spark=spark).set_index("k")
    want = pdf.set_index("k")
    _match(ldf.drop(index=3).reset_index(), want.drop(index=3).reset_index())
    _match(ldf.drop([1, 2, 4], axis=0).reset_index(), want.drop([1, 2, 4], axis=0).reset_index())


def test_drop_rows_multiindex(spark):
    pdf = pd.DataFrame(
        {
            "i1": [1, 1, 2, 2, 3, 3],
            "i2": [1, 2, 3, 4, 5, 6],
            "v": [1, 1, 1, 2, 2, 2],
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark).set_index(["i1", "i2"])
    want = pdf.set_index(["i1", "i2"])
    # full label tuple
    _match(ldf.drop((1, 2), axis=0).reset_index(), want.drop((1, 2), axis=0).reset_index())
    # by level
    _match(
        ldf.drop(3, axis=0, level=0).reset_index(),
        want.drop(3, axis=0, level=0).reset_index(),
    )
    _match(
        ldf.drop(3, axis=0, level="i2").reset_index(),
        want.drop(3, axis=0, level="i2").reset_index(),
    )
    # combined index + columns form
    _match(
        ldf.drop(index=(2, 3), columns="v").reset_index(),
        want.drop(index=(2, 3), columns="v").reset_index(),
    )


def test_drop_errors(spark):
    pdf = pd.DataFrame({"k": range(5), "v": range(5)})
    ldf = lps.from_pandas(pdf, spark=spark)
    with pytest.raises(ValueError):
        ldf.drop("v", columns="v")
    with pytest.raises(KeyError):
        ldf.drop(columns="missing")
    with pytest.raises(ValueError):
        ldf.drop(index=3)  # no stored index
