"""Round-5: sharded-Bloom false-positive rate property test.

The 8 KiB/shard bitmap's FP rate is the design's correctness knob (false
positives silently DROP unique documents). This pins the measured FP rate of
the actual streaming batch core (streaming/documents._bloom_batch) below the
analytic Bloom bound p = (1 - e^(-kn/m))^k at the design load, across random
streams (hypothesis-driven seeds). No false negatives is also asserted
exactly: a re-probed triple must always flag."""

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from legate_pandas_spark.streaming.documents import (
    _BLOOM_K,
    _BLOOM_SHARD_BITS,
    _bloom_batch,
)

# design load: ~0.5M-doc corpus over 64 shards → 8192 docs per shard
_DESIGN_N = 8192


def _triples(rng, n):
    return pd.DataFrame(
        {f"p{i}": rng.randint(0, _BLOOM_SHARD_BITS, size=n) for i in range(_BLOOM_K)}
    )


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_fp_rate_below_analytic_bound_at_design_load(seed):
    rng = np.random.RandomState(seed)
    bm = np.zeros(_BLOOM_SHARD_BITS // 8, dtype=np.uint8)
    inserted = _triples(rng, _DESIGN_N)
    _bloom_batch(bm, inserted)

    # analytic bound at the actual load
    p_bound = (1.0 - math.exp(-_BLOOM_K * _DESIGN_N / _BLOOM_SHARD_BITS)) ** _BLOOM_K

    # probe with FRESH random triples; exclude accidental collisions with an
    # inserted triple (those are true positives, not false ones)
    probes = _triples(rng, 8000)
    merged = probes.merge(inserted.drop_duplicates(), how="left", indicator=True)
    fresh = merged[merged["_merge"] == "left_only"].drop(columns="_merge")
    flags = _bloom_batch(bm.copy(), fresh.reset_index(drop=True))
    fp_rate = float(flags.mean())
    # 1.5x headroom: sampling noise at 8k probes is ~0.2 percentage points
    assert fp_rate <= 1.5 * p_bound, (fp_rate, p_bound)
    # and the load itself must sit in the useful regime (the design claim)
    assert p_bound < 0.05


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_no_false_negatives_ever(seed):
    rng = np.random.RandomState(seed)
    bm = np.zeros(_BLOOM_SHARD_BITS // 8, dtype=np.uint8)
    batch = _triples(rng, 2000)
    _bloom_batch(bm, batch)
    reflags = _bloom_batch(bm, batch)  # every re-probe must flag
    assert bool(reflags.all())


def test_intra_batch_duplicate_keeps_first_occurrence():
    bm = np.zeros(_BLOOM_SHARD_BITS // 8, dtype=np.uint8)
    batch = pd.DataFrame(
        {"p0": [5, 5, 9], "p1": [7, 7, 11], "p2": [13, 13, 17]}
    )
    flags = _bloom_batch(bm, batch)
    assert flags.tolist() == [False, True, False]
