"""Round-8: adaptive lazy position prefix — both branches must agree.

_attach_positions_lazy picks a single-level broadcast self-join at P <= 1024
(minimal plan stages, A/B-measured faster at local scale) and the two-level
bucketed prefix above (scales to 800k-partition scans without a driver
collect). Pin both branches to identical positions/offsets on the same input.
"""

import pytest
from pyspark.sql import functions as F


def _make_sdf(spark, n, parts):
    from legate_pandas_spark.frontend.frame import ROW_ORDER

    return (
        spark.range(n)
        .select(F.col("id").alias("v"))
        .repartition(parts)
        .withColumn(ROW_ORDER, F.monotonically_increasing_id())
    )


@pytest.mark.parametrize("two_level", [False, True])
def test_lazy_prefix_branches_agree(spark, two_level):
    from legate_pandas_spark.frontend import scan
    from legate_pandas_spark.frontend.frame import ROW_ORDER

    sdf = _make_sdf(spark, 173, 7)

    with_pos, offsets = scan._attach_positions_lazy(
        sdf, fresh=True, pos_name="__tp__", force_two_level=two_level
    )
    off_rows = offsets.collect()
    # offsets: starts are the exclusive prefix of counts in pid order
    off_rows.sort(key=lambda r: r["pid"])
    running = 0
    for r in off_rows:
        assert r["start"] == running
        running += r["cnt"]
    assert running == 173

    rows = with_pos.select(ROW_ORDER, "__tp__").collect()
    rows.sort(key=lambda r: r[0])
    positions = [r[1] for r in rows]
    # positions are a permutation of 0..n-1, increasing in ROW_ORDER order
    assert sorted(positions) == list(range(173))
    assert positions == sorted(positions)


@pytest.mark.parametrize("two_level", [False, True])
def test_lazy_prefix_nonfresh(spark, two_level):
    """fresh=False path: local position from a per-pid window (row order has
    gaps, e.g. after a filter)."""
    from legate_pandas_spark.frontend import scan
    from legate_pandas_spark.frontend.frame import ROW_ORDER

    sdf = _make_sdf(spark, 100, 5).filter(F.col("v") % 3 != 0)
    n = sdf.count()

    with_pos, offsets = scan._attach_positions_lazy(
        sdf, fresh=False, pos_name="__tp__", force_two_level=two_level
    )
    rows = with_pos.select(ROW_ORDER, "__tp__").collect()
    rows.sort(key=lambda r: r[0])
    positions = [r[1] for r in rows]
    assert sorted(positions) == list(range(n))
    assert positions == sorted(positions)
    assert offsets.agg(F.sum("cnt")).collect()[0][0] == n
