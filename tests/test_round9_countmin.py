"""countmin_token_freq: full pure-Python count-min reimplementation
(hashlib md5, same salted-bucket arithmetic) differential + the sketch
upper-bound property over EVERY token, not just the reported top-10."""

import hashlib
import re

import pandas as pd
import pytest

D, W = 4, 1024


def _bucket(d, w):
    h = hashlib.md5(f"{d}:{w}".encode("utf-8")).hexdigest()[:6]
    return int(h, 16) % W


_ASCII_WS = " \t\n\r\f\v"
_SPLIT = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII; Python \s is Unicode


def _py_countmin(texts):
    counts = {}
    counters = {}
    for t in texts:
        if t is None:
            continue
        for w in _SPLIT.split(t.strip(_ASCII_WS)):
            if w == "":
                continue
            counts[w] = counts.get(w, 0) + 1
            for d in range(D):
                k = (d, _bucket(d, w))
                counters[k] = counters.get(k, 0) + 1
    top10 = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = []
    for w, n in top10:
        est = min(counters[(d, _bucket(d, w))] for d in range(D))
        rows.append((w, n, est, est >= n))
    return sorted(rows), counts, counters


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


def test_countmin_matches_python_reference(catalog, spark, sf_dir):
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet").text.tolist()
    want, _, _ = _py_countmin(texts)
    out = catalog["countmin_token_freq"](spark, sf_dir).toPandas()
    got = sorted(
        map(
            tuple,
            out[["token", "exact_n", "cm_est", "sketch_upper_bound"]].itertuples(
                index=False
            ),
        )
    )
    assert got == want


def test_countmin_upper_bound_holds_for_every_token(sf_dir):
    """est(w) >= true(w) for ALL tokens (min over rows of counters that each
    include w's own contributions) — the CM guarantee the catalog query
    asserts only for the top-10."""
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet").text.tolist()
    _, counts, counters = _py_countmin(texts)
    for w, n in counts.items():
        est = min(counters[(d, _bucket(d, w))] for d in range(D))
        assert est >= n
