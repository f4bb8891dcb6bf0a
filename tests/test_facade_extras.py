"""str.split(expand)/get/join/cat, dt.floor/strftime, frame round/abs/clip/agg/T
— differential vs real pandas."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


def test_str_split_expand(spark):
    pdf = pd.DataFrame({"s": ["a-b-c", "x-y", "solo"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["s"].str.split("-", expand=True).to_pandas()
    want = pdf["s"].str.split("-", expand=True)
    want.columns = [str(c) for c in want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_str_get_join_cat(spark):
    pdf = pd.DataFrame({"s": ["a b c", "d e", "f"], "t": ["1", "2", "3"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got_get = ldf["s"].str.split().str.get(1).to_pandas()
    want_get = pdf["s"].str.split().str.get(1)
    pd.testing.assert_series_equal(got_get, want_get, check_names=False)
    got_join = ldf["s"].str.split().str.join("|").to_pandas()
    pd.testing.assert_series_equal(
        got_join, pdf["s"].str.split().str.join("|"), check_names=False
    )
    got_cat = ldf["s"].str.cat(ldf["t"], sep="_").to_pandas()
    pd.testing.assert_series_equal(
        got_cat, pdf["s"].str.cat(pdf["t"], sep="_"), check_names=False
    )


def test_dt_floor_strftime(spark):
    ts = pd.to_datetime(
        ["2024-03-05 10:47:13", "2024-03-05 23:59:59", "2024-07-01 00:00:01"]
    )
    pdf = pd.DataFrame({"ts": ts})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["ts"].dt.floor("h").to_pandas()
    want = pdf["ts"].dt.floor("h")
    pd.testing.assert_series_equal(got, want, check_names=False)
    got_s = ldf["ts"].dt.strftime("%Y-%m-%d %H:%M").to_pandas()
    want_s = pdf["ts"].dt.strftime("%Y-%m-%d %H:%M")
    pd.testing.assert_series_equal(got_s, want_s, check_names=False)


def test_frame_round_abs_clip(spark):
    pdf = pd.DataFrame({"x": [-1.234, 5.678, -9.1], "s": list("abc")})
    ldf = lps.from_pandas(pdf, spark=spark)
    pd.testing.assert_frame_equal(
        ldf.round(1).to_pandas(), pdf.round(1), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        ldf.abs().to_pandas(),
        pdf.assign(x=pdf["x"].abs()),
        check_dtype=False,
    )
    pd.testing.assert_frame_equal(
        ldf.clip(-2, 2).to_pandas(),
        pdf.assign(x=pdf["x"].clip(-2, 2)),
        check_dtype=False,
    )


def test_frame_agg_dict(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [10, 20, 30]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.agg({"x": ["sum", "mean"], "y": "max"})
    want = pdf.agg({"x": ["sum", "mean"], "y": "max"})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_transpose_small(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.T.to_pandas()
    want = pdf.T
    want.columns = [str(c) for c in want.columns]
    got.index.name = None
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
