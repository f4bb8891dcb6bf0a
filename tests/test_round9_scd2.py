"""scd2_user_type_history: SCD2 semantic invariants + single-exchange plan
pin, and bit-for-bit parity of the streaming change-capture twin."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


@pytest.fixture(scope="module")
def scd2(catalog, spark, sf_dir):
    return catalog["scd2_user_type_history"](spark, sf_dir).toPandas()


def test_scd2_invariants(scd2):
    """Versions are contiguous from 1, exactly one open (is_current) range per
    user, ranges chain (valid_to == next valid_from), and no two consecutive
    versions carry the same event_type (else it wasn't a change)."""
    g = scd2.sort_values(["user_id", "version"]).groupby("user_id")
    for _, h in g:
        assert list(h.version) == list(range(1, len(h) + 1))
        assert int(h.is_current.sum()) == 1
        assert bool(h.iloc[-1].is_current)
        # ranges chain and never go backwards
        assert (h.valid_to.iloc[:-1].values == h.valid_from.iloc[1:].values).all()
        assert (h.valid_from.iloc[:-1].values <= h.valid_to.iloc[:-1].values).all()
        # consecutive versions differ in type (null-safe)
        prev, cur = h.event_type.iloc[:-1], h.event_type.iloc[1:]
        same = (prev.values == cur.values) & ~pd.isna(prev.values) | (
            pd.isna(prev.values) & pd.isna(cur.values)
        )
        assert not same.any()


def test_scd2_covers_every_user(scd2, duck):
    n_users = duck.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert scd2.user_id.nunique() == n_users


def test_scd2_single_exchange_plan(catalog, spark, sf_dir):
    """All three window passes (lag change detection, lead/row_number
    versioning) must share ONE hash exchange on user_id — the change filter
    preserves the partitioning AND the (ts, event_id) sort order, so the
    second window adds no exchange and no re-sort."""
    df = catalog["scd2_user_type_history"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("+- Sort ") == 1


def test_scd2_change_stream_matches_batch(catalog, spark, sf_dir, tmp_path):
    """The streaming change-capture twin must emit exactly the batch query's
    (user_id, version, event_type, valid_from) rows."""
    import shutil

    from legate_pandas_spark.streaming import (
        run_available_now,
        scd2_change_capture_stream,
        stream_events,
    )

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")

    stream = scd2_change_capture_stream(stream_events(spark, str(d)))
    run_available_now(stream, "scd2_stream", output_mode="update")
    got = spark.table("scd2_stream").toPandas()

    want = catalog["scd2_user_type_history"](spark, sf_dir).toPandas()[
        ["user_id", "version", "event_type", "valid_from"]
    ]
    key = ["user_id", "version"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
