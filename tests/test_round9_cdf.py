"""snapshot_diff_cdf: pandas reference differential + the modular census the
construction implies (inserts = keys only in B, deletes = only in A, updates
= shifted-measure keys present in both)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


def _py_cdf(events):
    import math

    rows = []
    cents = {
        int(e): int(math.floor(v * 100 + 0.5))
        for e, v in zip(events.event_id, events.value)
    }
    a = {e: (c - 7 if e % 5 == 0 else c) for e, c in cents.items() if e % 3 != 0}
    b = {e: c for e, c in cents.items() if e % 7 != 0}
    for e in sorted(set(a) | set(b)):
        in_a, in_b = e in a, e in b
        if in_a and not in_b:
            rows.append((e, "delete", a[e], None))
        elif in_b and not in_a:
            rows.append((e, "insert", None, b[e]))
        elif a[e] != b[e]:
            rows.append((e, "update", a[e], b[e]))
    return rows


def test_cdf_matches_pandas_reference(catalog, spark, sf_dir):
    events = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_id", "value"]]
    want = _py_cdf(events)
    out = catalog["snapshot_diff_cdf"](spark, sf_dir).toPandas()
    got = sorted(
        (
            int(r.event_id),
            r.change_type,
            None if pd.isna(r.old_cents) else int(r.old_cents),
            None if pd.isna(r.new_cents) else int(r.new_cents),
        )
        for r in out.itertuples()
    )
    assert got == want


def test_cdf_census_follows_construction(catalog, spark, sf_dir):
    """insert keys are exactly {%3==0, %7!=0}; delete keys exactly
    {%3!=0, %7==0}; update keys exactly {%15 in {5,10}, %7!=0} (the -7 cent
    shift always changes the value)."""
    out = catalog["snapshot_diff_cdf"](spark, sf_dir).toPandas()
    ids = pd.read_parquet(f"{sf_dir}/events.parquet").event_id
    ins = set(out[out.change_type == "insert"].event_id)
    del_ = set(out[out.change_type == "delete"].event_id)
    upd = set(out[out.change_type == "update"].event_id)
    assert ins == {int(e) for e in ids if e % 3 == 0 and e % 7 != 0}
    assert del_ == {int(e) for e in ids if e % 3 != 0 and e % 7 == 0}
    assert upd == {
        int(e) for e in ids if e % 5 == 0 and e % 3 != 0 and e % 7 != 0
    }
    # update rows carry both sides, exactly 7 cents apart
    u = out[out.change_type == "update"]
    assert ((u.new_cents - u.old_cents) == 7).all()
