"""loc/iloc/at/iat, scatter updates, categorical codes, IO round-trips —
differential vs real pandas (reference tests/pandas/df_loc*.py, df_iloc*.py,
sr_cat_codes.py, tests/io/*)."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame(
        {
            "k": np.arange(20, dtype="int64"),
            "v": np.arange(20, dtype="float64") * 1.5,
            "c": [["AA", "BB", "CC", "DD"][i % 4] for i in range(20)],
        }
    )


@pytest.fixture(scope="module")
def ldf(pdf, spark):
    return lps.from_pandas(pdf, spark=spark)


def _match(lps_df, pandas_df):
    got = lps_df.to_pandas()
    if got.index.name or isinstance(got.index, pd.MultiIndex):
        got = got.reset_index()
        pandas_df = pandas_df.reset_index()
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = pandas_df.sort_values(list(pandas_df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_loc_label_slice(ldf, pdf):
    got = ldf.set_index("k").loc[5:10]
    want = pdf.set_index("k").loc[5:10]
    _match(got, want)


def test_loc_mask_and_columns(ldf, pdf):
    got = ldf.loc[ldf["v"] > 10, ["k", "c"]]
    want = pdf.loc[pdf["v"] > 10, ["k", "c"]]
    _match(got, want)


def test_loc_scatter_update(ldf, pdf):
    got = ldf.copy()
    got.loc[got["k"] < 5, "v"] = -1.0
    want = pdf.copy()
    want.loc[want["k"] < 5, "v"] = -1.0
    _match(got, want)


def test_iloc_slice(ldf, pdf):
    got = ldf.iloc[3:7]
    want = pdf.iloc[3:7]
    # row order guaranteed by the partition-stable order key on a fresh frame
    _match(got, want)


def test_iloc_negative_row(ldf, pdf):
    assert ldf.iloc[-1]["k"].to_pandas().iloc[0] == pdf.iloc[-1]["k"]


def test_at_iat(ldf, pdf):
    assert ldf.set_index("k").at[7, "v"] == pdf.set_index("k").at[7, "v"]
    assert ldf.iat[3, 1] == pdf.iat[3, 1]


def test_cat_codes(ldf, pdf):
    got = ldf.copy()
    got["codes"] = got["c"].cat.codes
    want = pdf.copy()
    want["codes"] = want["c"].astype("category").cat.codes
    _match(got, want)


def test_cat_codes_with_nulls(spark):
    p = pd.DataFrame({"c": ["BB", None, "AA", "BB", None]})
    l = lps.from_pandas(p, spark=spark)
    got = l.copy()
    got["codes"] = got["c"].cat.codes
    want = p.copy()
    want["codes"] = want["c"].astype("category").cat.codes
    _match(got, want)


def test_parquet_roundtrip(ldf, pdf, tmp_path, spark):
    path = str(tmp_path / "rt.parquet")
    ldf.to_parquet(path)
    back = lps.read_parquet(path, spark=spark)
    _match(back, pdf)


def test_csv_roundtrip(ldf, pdf, tmp_path, spark):
    path = str(tmp_path / "rt_csv")
    ldf.to_csv(path)
    back = lps.read_csv(path, spark=spark)
    _match(back, pdf)


def test_read_csv_options(tmp_path, spark):
    f = tmp_path / "opt.csv"
    f.write_text("a:b:c\n1:x:2.5\n2:y:NA\n3:z:7.0\n")
    got = lps.read_csv(str(f), sep=":", na_values="NA", spark=spark)
    want = pd.read_csv(str(f), sep=":", na_values="NA")
    _match(got, want)


def test_read_csv_names_no_header(tmp_path, spark):
    f = tmp_path / "nh.csv"
    f.write_text("1,10.5\n2,20.5\n")
    got = lps.read_csv(str(f), names=["id", "val"], header=None, spark=spark)
    want = pd.read_csv(str(f), names=["id", "val"], header=None)
    _match(got, want)


def test_read_csv_usecols_nrows(tmp_path, spark):
    f = tmp_path / "uc.csv"
    f.write_text("a,b,c\n1,2,3\n4,5,6\n7,8,9\n")
    got = lps.read_csv(str(f), usecols=["a", "c"], nrows=2, spark=spark)
    want = pd.read_csv(str(f), usecols=["a", "c"], nrows=2)
    assert sorted(got.columns) == ["a", "c"]
    assert len(got) == 2
    _match(got, want)


def test_read_csv_parse_dates(tmp_path, spark):
    f = tmp_path / "pd.csv"
    f.write_text("d,v\n2024-01-01 10:00:00,1\n2024-06-15 23:30:00,2\n")
    got = lps.read_csv(str(f), parse_dates=["d"], spark=spark)
    want = pd.read_csv(str(f), parse_dates=["d"])
    _match(got, want)


def test_tail(ldf, pdf):
    got = ldf.tail(4)
    want = pdf.tail(4)
    _match(got, want)


def test_insert_pop(ldf, pdf):
    got = ldf.copy()
    got.insert(1, "z", got["k"] * 10)
    popped = got.pop("c")
    want = pdf.copy()
    want.insert(1, "z", want["k"] * 10)
    want = want.drop(columns=["c"])
    assert got.columns == list(want.columns)  # insert position preserved
    _match(got, want)


def test_read_csv_gzip(tmp_path, spark):
    import gzip

    f = tmp_path / "z.csv.gz"
    with gzip.open(f, "wt") as fh:
        fh.write("a,b\n1,x\n2,y\n3,z\n")
    got = lps.read_csv(str(f), spark=spark)
    want = pd.read_csv(str(f))
    _match(got, want)


def test_to_csv_single_file(tmp_path, spark):
    import os

    p = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    l = lps.from_pandas(p, spark=spark)
    path = str(tmp_path / "single_csv")
    l.to_csv(path, single_file=True)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 1  # coalesce(1): reference single-file mode
    back = lps.read_csv(path, spark=spark)
    _match(back, p)


def test_squeeze(ldf):
    s = ldf[["v"]].squeeze()
    assert s.name == "v"
    assert abs(s.sum() - ldf["v"].sum()) < 1e-9


def test_to_parquet_partitioned(tmp_path, spark):
    p = pd.DataFrame({"part": ["a", "a", "b"], "v": [1, 2, 3]})
    l = lps.from_pandas(p, spark=spark)
    path = str(tmp_path / "pp")
    l.to_parquet(path, partition_cols=["part"])
    import os

    assert sorted(d for d in os.listdir(path) if d.startswith("part=")) == ["part=a", "part=b"]
    back = lps.read_parquet(path, spark=spark).to_pandas()
    assert sorted(back["v"]) == [1, 2, 3]


def test_iloc_loc_list_keys(spark):
    import pandas as pd

    import legate_pandas_spark as lps

    p = pd.DataFrame({"k": [10, 20, 30, 40, 50], "v": list("abcde")})
    l = lps.from_pandas(p, spark=spark)
    got = l.iloc[[0, 2, -1]].to_pandas().sort_values("k").reset_index(drop=True)
    want = p.iloc[[0, 2, -1]].sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    l2 = l.set_index("k")
    got = l2.loc[[20, 40]].to_pandas().sort_index()
    want = p.set_index("k").loc[[20, 40]].sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
