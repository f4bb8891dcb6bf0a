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


from hypothesis import given, settings
from hypothesis import strategies as st


def _py_scd2(rows):
    """Pure-pandas/python SCD2 reference: per user ordered by (ts, event_id),
    null-safe change detection, version numbering, lead(valid_from)."""
    out = []
    byuser = {}
    for ts, user, eid, typ in rows:
        byuser.setdefault(user, []).append((ts, eid, typ))
    for user, evs in byuser.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        changes = []
        prev = object()  # sentinel != anything incl. None
        for ts, eid, typ in evs:
            if typ != prev:
                changes.append([ts, typ])
            prev = typ
        for i, (vf, typ) in enumerate(changes):
            vt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.append((user, i + 1, typ, vf, vt, vt is None))
    return sorted(out, key=lambda t: (t[0], t[1]))


_EVENT = st.tuples(
    st.integers(min_value=0, max_value=5),      # ts bucket (forces ties)
    st.integers(min_value=1, max_value=3),      # user
    st.integers(min_value=1, max_value=10_000), # event_id (unique-ish)
    st.sampled_from(["a", "b", None]),          # event_type incl. null state
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_EVENT, min_size=1, max_size=40, unique_by=lambda e: e[2]))
def test_scd2_fuzz_matches_reference(spark, tmp_path_factory, events):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01")
    rows = [
        (base + pd.Timedelta(hours=ts), user, eid, typ)
        for ts, user, eid, typ in events
    ]
    pdf = pd.DataFrame(rows, columns=["ts", "user_id", "event_id", "event_type"])
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    d = tmp_path_factory.mktemp("scd2fuzz")
    tbl = pa.Table.from_pandas(pdf, preserve_index=False).set_column(
        list(pdf.columns).index("ts"),
        "ts",
        pa.array(pdf["ts"], type=pa.timestamp("us")),
    )
    pq.write_table(tbl, d / "events.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["scd2_user_type_history"](spark, str(d)).toPandas()
    got = [
        (
            int(r.user_id),
            int(r.version),
            None if pd.isna(r.event_type) else r.event_type,
            pd.Timestamp(r.valid_from),
            None if pd.isna(r.valid_to) else pd.Timestamp(r.valid_to),
            bool(r.is_current),
        )
        for r in out.itertuples()
    ]
    got.sort(key=lambda t: (t[0], t[1]))
    want = _py_scd2(rows)
    assert got == want
