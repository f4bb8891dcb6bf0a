"""IO parity with the reference's fixture corpus (reference tests/io/files/:
colons, quotes, custom tokens, gzip/bz2, multi-file, %m/%Y dates, mortgage
pipe-delimited CSVs — FIXTURES.md F5/F6)."""

import bz2
import gzip

import pandas as pd
import pytest

import legate_pandas_spark as lps


def _match(lps_df, pandas_df):
    got = lps_df.to_pandas()
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = pandas_df.sort_values(list(pandas_df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_read_csv_bz2(tmp_path, spark):
    f = tmp_path / "z.csv.bz2"
    with bz2.open(f, "wt") as fh:
        fh.write("a,b\n1,x\n2,y\n")
    _match(lps.read_csv(str(f), spark=spark), pd.read_csv(str(f)))


def test_read_csv_multi_file(tmp_path, spark):
    d = tmp_path / "many"
    d.mkdir()
    (d / "p1.csv").write_text("a,b\n1,x\n")
    (d / "p2.csv").write_text("a,b\n2,y\n3,z\n")
    got = lps.read_csv(str(d), spark=spark)
    want = pd.concat([pd.read_csv(d / "p1.csv"), pd.read_csv(d / "p2.csv")])
    _match(got, want)


def test_read_csv_skipfooter(tmp_path, spark):
    """skipfooter (reference option table, frontend/io.py:125-369): drop the
    trailing n rows — positional filter from the same offsets aggregate as
    skiprows."""
    f = tmp_path / "sf.csv"
    f.write_text("a,b\n1,x\n2,y\n3,z\n4,footer\n")
    got = lps.read_csv(str(f), skipfooter=1, spark=spark)
    want = pd.read_csv(str(f), skipfooter=1, engine="python")
    _match(got, want)
    got2 = lps.read_csv(str(f), skiprows=1, skipfooter=2, header=None,
                        names=["a", "b"], spark=spark)
    want2 = pd.read_csv(str(f), skiprows=1, skipfooter=2, header=None,
                        names=["a", "b"], engine="python")
    _match(got2, want2)


def test_read_csv_quoted_fields(tmp_path, spark):
    f = tmp_path / "q.csv"
    f.write_text('a,b\n"hello, world",1\n"say ""hi""",2\n')
    _match(lps.read_csv(str(f), spark=spark), pd.read_csv(str(f)))


def test_read_csv_month_year_format(tmp_path, spark):
    f = tmp_path / "my.csv"
    f.write_text("d,v\n03/2001,1\n11/1999,2\n")
    got = lps.read_csv(str(f), parse_dates=["d"], date_format="%m/%Y", spark=spark)
    want = pd.read_csv(str(f), parse_dates=["d"], date_format="%m/%Y")
    _match(got, want)


@pytest.fixture()
def mortgage_csvs(tmp_path):
    """Tiny mortgage-shaped fixtures (reference benchmarks/mortgage/mortgage.py:
    pipe-delimited performance + acquisition + broadcast names table)."""
    perf = tmp_path / "perf.csv"
    perf.write_text(
        "loan_id|reporting_period|servicer|interest_rate|upb|loan_age|delinquency\n"
        "1|2001-03-01|BANK OF X|6.5|90000.0|10|0\n"
        "1|2001-04-01|BANK OF X|6.5|89000.0|11|1\n"
        "2|2001-03-01|Y CORP|7.1|150000.0|3|0\n"
        "3|2001-03-01||7.9|20000.0|50|2\n"
    )
    acq = tmp_path / "acq.csv"
    acq.write_text(
        "loan_id|seller_name|orig_balance\n1|BANK OF X|100000.0\n2|Y CORP|160000.0\n3|Z|25000.0\n"
    )
    names = tmp_path / "names.csv"
    names.write_text("seller_name|new_seller_name\nBANK OF X|BankX\nY CORP|YCorp\n")
    return str(perf), str(acq), str(names)


def test_mortgage_workflow_facade(mortgage_csvs, spark):
    """The reference's flagship E2E (CSV ingest → broadcast name remap → left
    merge → dt features → fillna → groupby agg) through the facade."""
    perf_p, acq_p, names_p = mortgage_csvs
    perf = lps.read_csv(perf_p, sep="|", parse_dates=["reporting_period"], spark=spark)
    acq = lps.read_csv(acq_p, sep="|", spark=spark)
    names = lps.read_csv(names_p, sep="|", spark=spark)

    acq2 = acq.merge(names, on="seller_name", how="left", broadcast=True)
    acq2["seller"] = acq2["new_seller_name"].fillna("OTHER")
    joined = perf.merge(acq2[["loan_id", "seller", "orig_balance"]], on="loan_id", how="left")
    joined["report_month"] = joined["reporting_period"].dt.month
    joined["rate_filled"] = joined["interest_rate"].fillna(-1.0)
    joined["ever_delinquent"] = joined["delinquency"] > 0
    g = (
        joined.groupby("seller")
        .agg({"upb": "sum", "loan_id": "nunique", "delinquency": "max"})
        .reset_index()
        .to_pandas()
        .sort_values("seller")
        .reset_index(drop=True)
    )
    # pandas reference computation
    p_perf = pd.read_csv(perf_p, sep="|", parse_dates=["reporting_period"])
    p_acq = pd.read_csv(acq_p, sep="|")
    p_names = pd.read_csv(names_p, sep="|")
    p_acq2 = p_acq.merge(p_names, on="seller_name", how="left")
    p_acq2["seller"] = p_acq2["new_seller_name"].fillna("OTHER")
    p_joined = p_perf.merge(p_acq2[["loan_id", "seller", "orig_balance"]], on="loan_id", how="left")
    want = (
        p_joined.groupby("seller")
        .agg(upb=("upb", "sum"), loan_id=("loan_id", "nunique"), delinquency=("delinquency", "max"))
        .reset_index()
        .sort_values("seller")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g[want.columns.tolist()], want, check_dtype=False)


def test_orc_roundtrip(tmp_path, spark):
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    path = str(tmp_path / "t.orc")
    ldf.to_orc(path)
    got = lps.read_orc(path, spark=spark).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v"]], pdf, check_dtype=False)


def test_json_sink_roundtrip(tmp_path, spark):
    pdf = pd.DataFrame({"k": [1, 2], "v": ["x", "y"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    path = str(tmp_path / "t.json")
    ldf.to_json(path)
    got = lps.read_json(path, spark=spark).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v"]], pdf, check_dtype=False)


def test_partitioned_parquet_write(tmp_path, spark):
    pdf = pd.DataFrame({"part": ["a", "a", "b"], "v": [1, 2, 3]})
    ldf = lps.from_pandas(pdf, spark=spark)
    path = str(tmp_path / "part.parquet")
    ldf.to_parquet(path, partition_cols=["part"])
    import os
    assert sorted(d for d in os.listdir(path) if d.startswith("part=")) == ["part=a", "part=b"]
    got = lps.read_parquet(path, spark=spark).to_pandas()
    assert sorted(got["v"]) == [1, 2, 3]


def test_read_csv_category_dtype(spark, tmp_path):
    """dtype='category' columns come back as the modeled categorical dtype
    (reference tests/io/read_csv_category.py)."""
    import pandas as pd

    import legate_pandas_spark as lps

    p = tmp_path / "cat.csv"
    p.write_text("a,b\n1,x\n2,y\n3,x\n4,z\n")
    got = lps.read_csv(str(p), dtype={"a": "int64", "b": "category"}, spark=spark)
    pdf = got.to_pandas()
    assert isinstance(pdf["b"].dtype, pd.CategoricalDtype)
    want = pd.read_csv(str(p), dtype={"a": "int64", "b": "category"})
    pd.testing.assert_frame_equal(pdf, want, check_dtype=False)
    # codes flow through the categorical machinery (broadcast dictionary)
    codes = got["b"].cat.codes.to_pandas()
    assert list(codes) == list(want["b"].cat.codes)
