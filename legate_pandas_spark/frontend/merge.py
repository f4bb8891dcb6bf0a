"""pandas merge semantics on Spark joins (reference frontend/merge.py:20-130,
core/merge.py:103-240 key resolution, :490-614 output naming).

What the frontend owns: key resolution (on/left_on/right_on/left_index/
right_index, common-column inference), ``_x/_y`` suffixing of colliding non-key
columns, outer-join key coalescing, and pandas column ordering. What Spark owns:
everything physical — SMJ/SHJ/broadcast selection, partitioning reuse, AQE.

Extensions over the reference: how='right' (flipped left; reference raises,
frontend/merge.py:69-74) and how='cross'/'semi'/'anti'.
"""

from __future__ import annotations

import pyspark.sql.functions as F

class MergeError(ValueError):
    """pandas.errors.MergeError twin (subclasses ValueError like pandas)."""


_HOW_MAP = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full_outer",
    "cross": "cross",
    "semi": "left_semi",
    "anti": "left_anti",
}


def merge(
    left,
    right,
    how: str = "inner",
    on=None,
    left_on=None,
    right_on=None,
    left_index: bool = False,
    right_index: bool = False,
    suffixes: tuple[str, str] = ("_x", "_y"),
    broadcast: bool = False,
    indicator: bool = False,
    validate: str | None = None,
):
    from legate_pandas_spark.frontend.frame import DataFrame

    if how not in _HOW_MAP:
        raise ValueError(f"invalid how: {how!r}")

    lcols = left.columns + list(left._index)
    rcols = right.columns + list(right._index)

    # ---- key resolution (pandas rules) -----------------------------------
    if left_index and right_index:
        lkeys, rkeys = list(left._index), list(right._index)
        shared_key = [ln == rn for ln, rn in zip(lkeys, rkeys)]
    elif on is not None:
        on = [on] if isinstance(on, str) else list(on)
        lkeys = rkeys = on
        shared_key = [True] * len(on)
    elif left_on is not None or right_on is not None:
        if left_on is None or right_on is None:
            raise ValueError("left_on and right_on must be given together")
        lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        if len(lkeys) != len(rkeys):
            raise ValueError("left_on and right_on must have equal length")
        shared_key = [ln == rn for ln, rn in zip(lkeys, rkeys)]
    elif how == "cross":
        lkeys, rkeys, shared_key = [], [], []
    else:
        # pandas common-column inference
        common = [c for c in left.columns if c in set(right.columns)]
        if not common:
            raise ValueError("no common columns to merge on")
        lkeys = rkeys = common
        shared_key = [True] * len(common)

    for k in lkeys:
        if k not in lcols:
            raise KeyError(f"left key {k!r} not in columns")
    for k in rkeys:
        if k not in rcols:
            raise KeyError(f"right key {k!r} not in columns")

    if validate is not None:
        # pandas validate=: key-uniqueness audits, one cheap aggregate per
        # checked side (groupBy keys → any count>1; map-side combinable,
        # limit(1) short-circuits the scan of the duplicate list)
        _VALID = {
            "one_to_one": (True, True), "1:1": (True, True),
            "one_to_many": (True, False), "1:m": (True, False),
            "many_to_one": (False, True), "m:1": (False, True),
            "many_to_many": (False, False), "m:m": (False, False),
        }
        if validate not in _VALID:
            raise ValueError(f"invalid validate: {validate!r}")
        need_left, need_right = _VALID[validate]

        def _has_dupes(sdf, keys):
            return bool(
                sdf.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n__"))
                .filter(F.col("__n__") > 1)
                .limit(1)
                .collect()
            )

        if need_left and lkeys and _has_dupes(left._sdf, lkeys):
            raise MergeError(
                f"Merge keys are not unique in left dataset; not a {validate} merge"
            )
        if need_right and rkeys and _has_dupes(right._sdf, rkeys):
            raise MergeError(
                f"Merge keys are not unique in right dataset; not a {validate} merge"
            )

    # ---- build disambiguated join ----------------------------------------
    rpref = "__r__"
    lsdf = left._sdf.select(*lcols)
    rsdf = right._sdf.select(*[F.col(c).alias(rpref + c) for c in rcols])
    if indicator:
        # pandas indicator: presence markers survive the outer join as flags
        lsdf = lsdf.withColumn("__from_left__", F.lit(True))
        rsdf = rsdf.withColumn("__from_right__", F.lit(True))
    if broadcast:
        # reference method='broadcast' (core/merge.py:639-643) → Catalyst hint
        rsdf = F.broadcast(rsdf)

    if how == "cross":
        joined = lsdf.crossJoin(rsdf)
    else:
        cond = None
        for lk, rk in zip(lkeys, rkeys):
            # pandas matches NaN keys to each other (reference
            # df_merge_with_null tests this against real pandas) — null-safe
            # equality, still a hash-joinable equi-key in Spark
            c = lsdf[lk].eqNullSafe(rsdf[rpref + rk])
            cond = c if cond is None else (cond & c)
        joined = lsdf.join(rsdf, cond, _HOW_MAP[how])

    if how in ("semi", "anti"):
        return DataFrame(joined, left._index)

    # ---- output projection: pandas naming / ordering ----------------------
    out_cols = []
    rkey_shared = {rk for rk, sh in zip(rkeys, shared_key) if sh}
    lkey_shared = {lk for lk, sh in zip(lkeys, shared_key) if sh}
    collisions = (set(lcols) & set(rcols)) - lkey_shared

    for c in lcols:
        if c in lkey_shared and how in ("outer", "right"):
            rk = rkeys[lkeys.index(c)]
            out_cols.append(F.coalesce(F.col(c), F.col(rpref + rk)).alias(c))
        elif c in collisions:
            out_cols.append(F.col(c).alias(c + suffixes[0]))
        else:
            out_cols.append(F.col(c))
    for c in rcols:
        if c in rkey_shared:
            continue  # shared key emitted once from the left side
        if c in collisions:
            out_cols.append(F.col(rpref + c).alias(c + suffixes[1]))
        else:
            out_cols.append(F.col(rpref + c).alias(c))

    if indicator:
        out_cols.append(
            F.when(
                F.col("__from_left__").isNotNull() & F.col("__from_right__").isNotNull(),
                "both",
            )
            .when(F.col("__from_left__").isNotNull(), "left_only")
            .otherwise("right_only")
            .alias("_merge")
        )
    # index-index joins keep the (shared) index; key joins reset it (pandas:
    # merge result gets a fresh RangeIndex unless joining on index)
    out_index = tuple(left._index) if (left_index and right_index) else ()
    out = DataFrame(joined.select(*out_cols), out_index)
    # categorical dtype survives the merge on columns that keep their name
    # (pandas: shared categorical keys stay categorical)
    lmeta = getattr(left, "_cat_meta", {})
    rmeta = getattr(right, "_cat_meta", {})
    for c, m in {**rmeta, **lmeta}.items():
        if c in out._sdf.columns:
            out._cat_meta[c] = m
    return out
