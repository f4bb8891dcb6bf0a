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
    method: str | None = None,
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
    # reference merge method= (core/merge.py:85-92 JoinVariantCode HASH |
    # BROADCAST, default HASH): 'broadcast' replicates the right side;
    # 'hash' FORCES the partitioned path, overriding Catalyst's broadcast
    # cost-model pick — useful when the right side is dimension-sized but a
    # chain of nested broadcast builds would serialize on the driver
    # (measured 2.3x on the mortgage everdf chain, SCALE.md round 7).
    if method not in (None, "hash", "broadcast"):
        raise ValueError(f"invalid merge method: {method!r}")
    if broadcast or method == "broadcast":
        rsdf = F.broadcast(rsdf)
    elif method == "hash":
        rsdf = rsdf.hint("SHUFFLE_MERGE")

    lflags = getattr(left, "_nonnull_cols", frozenset())
    rflags = getattr(right, "_nonnull_cols", frozenset())
    plain_pairs = []  # key pairs joined with plain (not null-safe) equality
    if how == "cross":
        joined = lsdf.crossJoin(rsdf)
    else:
        cond = None
        for lk, rk in zip(lkeys, rkeys):
            if lk in lflags or rk in rflags:
                plain_pairs.append((lk, rk))
                # either side is provably null-free on this key, so plain
                # equality ≡ null-safe (a null can only match another null).
                # Plain keys hash-partition as hash(k) — Catalyst reuses an
                # upstream groupby's exchange instead of re-shuffling on
                # (coalesce(k), isnull(k)), the facade analog of the
                # reference's partition-key reuse (core/merge.py:296-354).
                c = lsdf[lk] == rsdf[rpref + rk]
            else:
                # pandas matches NaN keys to each other (reference
                # df_merge_with_null tests this against real pandas) —
                # null-safe equality, still a hash-joinable equi-key in Spark
                c = lsdf[lk].eqNullSafe(rsdf[rpref + rk])
            cond = c if cond is None else (cond & c)
        joined = lsdf.join(rsdf, cond, _HOW_MAP[how])

    if how in ("semi", "anti"):
        out = DataFrame(joined, left._index)
        out._nonnull_cols = frozenset(lflags)
        return out

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
    # propagate non-null guarantees: a surviving side's columns keep their
    # values (left under left/inner, right under right/inner); the other
    # side's columns may be nulled by non-matches. Outer propagates nothing.
    out_flags = set()
    if how in ("inner", "left", "cross"):
        for c in lcols:
            if c in lflags and not (c in lkey_shared and how in ("outer", "right")):
                out_flags.add(c + suffixes[0] if c in collisions else c)
    if how in ("inner", "right", "cross"):
        for c in rcols:
            if c in rflags and c not in rkey_shared:
                out_flags.add(c + suffixes[1] if c in collisions else c)
        # shared keys are emitted from the left expr; under inner the matched
        # values equal the right side's (non-null if the right key is
        # flagged); under right they coalesce to the right side's value
        for lk, rk, sh in zip(lkeys, rkeys, shared_key):
            if sh and rk in rflags:
                out_flags.add(lk)
    if how == "inner":
        # an inner join on PLAIN equality proves BOTH output key columns:
        # a null key on either side makes the predicate null → row dropped,
        # so every surviving key value is non-null (round-8 producer — each
        # new proof is another exchange a downstream groupby/merge can reuse)
        for lk, rk in plain_pairs:
            out_flags.add(lk + suffixes[0] if lk in collisions else lk)
            if rk not in rkey_shared:
                out_flags.add(rk + suffixes[1] if rk in collisions else rk)
    out._nonnull_cols = frozenset(out_flags)
    # categorical dtype survives the merge on columns that keep their name
    # (pandas: shared categorical keys stay categorical)
    lmeta = getattr(left, "_cat_meta", {})
    rmeta = getattr(right, "_cat_meta", {})
    for c, m in {**rmeta, **lmeta}.items():
        if c in out._sdf.columns:
            out._cat_meta[c] = m
    return out
