"""tz-aware datetime accessor ops (dt.tz_localize / tz_convert / tz) —
differential vs real pandas. The facade stores aware columns as UTC instants
plus a zone marker on the Series (the pandas internal form); frames carry no
zone metadata, so assigning an aware series raises a targeted guard."""

import pandas as pd
import pytest

import legate_pandas_spark as lps

TS = pd.to_datetime(
    [
        "2024-01-15 00:30:00",
        "2024-03-09 12:00:00",  # day before US spring-forward
        "2024-03-10 12:00:00",  # day of (wall time outside the gap)
        "2024-06-30 23:45:00",
        "2024-11-02 12:00:00",  # day before US fall-back
        "2024-11-03 12:00:00",  # day of (wall time outside the overlap)
        None,
        "2023-12-31 23:59:59",
    ]
)


@pytest.fixture(scope="module")
def frames(spark):
    pdf = pd.DataFrame({"ts": TS, "v": range(len(TS))})
    return lps.from_pandas(pdf, spark=spark), pdf


def test_tz_localize_extractors_match_pandas(frames):
    ldf, pdf = frames
    got = ldf["ts"].dt.tz_localize("America/New_York")
    exp = pdf["ts"].dt.tz_localize("America/New_York")
    for field in ["year", "month", "day", "hour", "minute", "weekday"]:
        g = getattr(got.dt, field).to_pandas().reset_index(drop=True)
        e = getattr(exp.dt, field)
        assert (
            g.astype("float64").fillna(-1) == e.astype("float64").fillna(-1)
        ).all(), field


def test_tz_convert_shifts_wall_time(frames):
    ldf, pdf = frames
    got = ldf["ts"].dt.tz_localize("America/New_York").dt.tz_convert("Asia/Tokyo")
    exp = pdf["ts"].dt.tz_localize("America/New_York").dt.tz_convert("Asia/Tokyo")
    assert got.dt.tz == "Asia/Tokyo"
    for field in ["day", "hour"]:
        g = getattr(got.dt, field).to_pandas().reset_index(drop=True)
        e = getattr(exp.dt, field)
        assert (
            g.astype("float64").fillna(-1) == e.astype("float64").fillna(-1)
        ).all(), field


def test_to_pandas_restores_awareness(frames):
    ldf, pdf = frames
    got = ldf["ts"].dt.tz_localize("Europe/Berlin").to_pandas().reset_index(drop=True)
    exp = pdf["ts"].dt.tz_localize("Europe/Berlin").rename(got.name)
    assert str(got.dtype).startswith("datetime64") and "Berlin" in str(got.dtype)
    assert (
        got.dt.tz_convert("UTC").fillna(pd.Timestamp(0, tz="UTC"))
        == exp.dt.tz_convert("UTC").fillna(pd.Timestamp(0, tz="UTC"))
    ).all()


def test_tz_localize_none_keeps_local_wall(frames):
    ldf, pdf = frames
    aware = ldf["ts"].dt.tz_localize("America/New_York")
    naive = aware.dt.tz_localize(None)
    exp = pdf["ts"].dt.tz_localize("America/New_York").dt.tz_localize(None)
    assert naive.dt.tz is None
    g = naive.to_pandas().reset_index(drop=True)
    assert (g.fillna(pd.Timestamp(0)) == exp.fillna(pd.Timestamp(0))).all()


def test_tz_convert_none_gives_naive_utc(frames):
    ldf, pdf = frames
    got = (
        ldf["ts"].dt.tz_localize("America/New_York").dt.tz_convert(None)
    )
    exp = pdf["ts"].dt.tz_localize("America/New_York").dt.tz_convert(None)
    assert got.dt.tz is None
    g = got.to_pandas().reset_index(drop=True)
    assert (g.fillna(pd.Timestamp(0)) == exp.fillna(pd.Timestamp(0))).all()


def test_tz_floor_normalize_local_wall(frames):
    ldf, pdf = frames
    got = ldf["ts"].dt.tz_localize("America/New_York")
    exp = pdf["ts"].dt.tz_localize("America/New_York")
    g = got.dt.normalize().to_pandas().reset_index(drop=True)
    e = exp.dt.normalize().rename(g.name)
    assert (
        g.dt.tz_convert("UTC").fillna(pd.Timestamp(0, tz="UTC"))
        == e.dt.tz_convert("UTC").fillna(pd.Timestamp(0, tz="UTC"))
    ).all()
    g2 = got.dt.floor("h").to_pandas().reset_index(drop=True)
    e2 = exp.dt.floor("h").rename(g2.name)
    assert (
        g2.dt.tz_convert("UTC").fillna(pd.Timestamp(0, tz="UTC"))
        == e2.dt.tz_convert("UTC").fillna(pd.Timestamp(0, tz="UTC"))
    ).all()


def test_tz_error_modes_match_pandas(frames):
    ldf, pdf = frames
    with pytest.raises(TypeError, match="tz_localize to localize"):
        ldf["ts"].dt.tz_convert("UTC")
    with pytest.raises(TypeError, match="tz_localize to localize"):
        pdf["ts"].dt.tz_convert("UTC")
    aware = ldf["ts"].dt.tz_localize("UTC")
    with pytest.raises(TypeError, match="tz_convert"):
        aware.dt.tz_localize("Asia/Tokyo")
    with pytest.raises(TypeError, match="tz_convert"):
        pdf["ts"].dt.tz_localize("UTC").dt.tz_localize("Asia/Tokyo")


def test_tz_aware_setitem_guarded(frames):
    ldf, _ = frames
    aware = ldf["ts"].dt.tz_localize("America/New_York")
    with pytest.raises(NotImplementedError, match="tz-aware"):
        ldf["aware"] = aware
    # the documented workarounds do land
    ldf2 = ldf.copy()
    ldf2["wall"] = aware.dt.tz_localize(None)
    ldf2["utc"] = aware.dt.tz_convert(None)
    out = ldf2.to_pandas()
    assert {"wall", "utc"} <= set(out.columns)


def test_reorder_levels_matches_pandas(spark):
    """reorder_levels (positions and names) vs real pandas; error modes:
    flat index TypeError, wrong-length AssertionError, duplicate-level
    targeted guard."""
    pdf = pd.DataFrame(
        {"a": [1, 2, 1], "b": ["x", "y", "x"], "c": [7, 8, 9], "v": [1.0, 2.0, 3.0]}
    )
    ldf = lps.from_pandas(pdf, spark=spark).set_index(["a", "b", "c"])
    exp = pdf.set_index(["a", "b", "c"])
    for order in ([2, 0, 1], ["b", "c", "a"], [-1, -3, -2]):
        got = ldf.reorder_levels(order).to_pandas()
        want = exp.reorder_levels(order)
        assert got.index.names == want.index.names
        assert sorted(got.index.tolist()) == sorted(want.index.tolist())
        assert sorted(got["v"].tolist()) == sorted(want["v"].tolist())
    flat = lps.from_pandas(pdf, spark=spark)
    with pytest.raises(TypeError, match="hierarchical"):
        flat.reorder_levels([0])
    with pytest.raises(AssertionError, match="same as number of levels"):
        ldf.reorder_levels([0, 1])
    with pytest.raises(NotImplementedError, match="repeated"):
        ldf.reorder_levels([0, 0, 1])


def test_str_batch_round9_matches_pandas(spark):
    """rfind/index/rindex/repeat/isdecimal/isnumeric/isspace/rpartition/
    encode — differential vs real pandas."""
    vals = ["ab_cd_ef", "xx", "_lead", "trail_", "", " \t ", "1234", "¼2",
            "²", "a_b", None]
    pdf = pd.DataFrame({"s": vals})
    ldf = lps.from_pandas(pdf, spark=spark)

    got = ldf["s"].str.rfind("_").to_pandas().reset_index(drop=True)
    want = pdf["s"].str.rfind("_")
    assert got.fillna(-9).tolist() == want.fillna(-9).tolist()

    got = ldf["s"].str.repeat(3).to_pandas().reset_index(drop=True)
    want = pdf["s"].str.repeat(3)
    assert got.fillna("@").tolist() == want.fillna("@").tolist()

    for op in ["isdecimal", "isnumeric", "isspace"]:
        got = getattr(ldf["s"].str, op)().to_pandas().reset_index(drop=True)
        want = getattr(pdf["s"].str, op)()
        # facade predicates are non-nullable (null -> False, the engine's
        # documented mask contract); pandas keeps None
        assert got.tolist() == [bool(x) if x is not None else False for x in want.tolist()], op

    got = ldf["s"].str.rpartition("_").to_pandas().reset_index(drop=True)
    want = pdf["s"].str.rpartition("_")
    for i in range(3):
        g = got[str(i)].fillna("@").tolist()
        w = want[i].fillna("@").tolist()
        assert g == w, f"rpartition col {i}: {g} vs {w}"

    got = ldf["s"].str.encode("utf-8").to_pandas().reset_index(drop=True)
    want = pdf["s"].str.encode("utf-8")
    assert got.fillna(b"@").tolist() == want.fillna(b"@").tolist()

    # index/rindex: found rows compute, a missing row raises at action time
    ok = lps.from_pandas(pd.DataFrame({"s": ["ab_cd", "_x"]}), spark=spark)
    assert ok["s"].str.index("_").to_pandas().tolist() == \
        pd.Series(["ab_cd", "_x"]).str.index("_").tolist()
    assert ok["s"].str.rindex("_").to_pandas().tolist() == \
        pd.Series(["ab_cd", "_x"]).str.rindex("_").tolist()
    bad = lps.from_pandas(pd.DataFrame({"s": ["nope"]}), spark=spark)
    import pytest as _pytest

    with _pytest.raises(Exception, match="substring not found"):
        bad["s"].str.index("_").to_pandas()
    with _pytest.raises(ValueError, match="substring not found"):
        pd.Series(["nope"]).str.index("_")
