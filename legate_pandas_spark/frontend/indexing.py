"""loc/iloc/at/iat indexers (reference frontend/indexing.py:135-705).

The reference binary-searches index bounds then range-slices regions
(core/index.py:385-417 FIND_BOUNDS, src/copy/tasks/slice_by_range.cc). On Spark:

* label slicing (loc) on a stored index → a pushed-down range filter (no binary
  search needed — parquet min/max stats prune row groups, which IS the
  distributed binary search).
* positional slicing (iloc) → partition-offset arithmetic, the reference's
  FIND_BOUNDS + weighted-partition design (core/table.py:629-772,
  core/runtime.py:1001-1008): one tiny aggregate computes per-partition row
  counts, the driver prefix-sums them into offsets (num_partitions scalars),
  and position = partition offset + partition-local rank. Every stage stays
  partition-parallel — no global (unpartitioned) window anywhere.
* scatter updates (``df.loc[mask, col] = v``) → copy-on-write conditional
  projection (reference scatter_by_mask, core/table.py:697-762).
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
from pyspark.sql.window import Window

# monotonically_increasing_id layout (stable, documented): partition id in the
# upper bits, per-partition record counter in the lower 33 bits.
_PID_BITS = 33
_pos_seq = itertools.count()


def _attach_positions(sdf, fresh: bool, pos_name: str = "__pos__", with_offsets: bool = False):
    """Return (sdf + global position column, total row count) — or, with
    ``with_offsets``, (sdf, total, [(pid, start_position, count), ...]).

    Mirrors the reference's FIND_BOUNDS: per-partition counts (one cheap
    aggregate whose result is num_partitions scalars) → driver prefix-sum →
    broadcast-joined offsets; position = offset[pid] + local rank. When the
    order key was attached fresh on this plan (``fresh``) the local counter in
    the id's low bits is contiguous, so the rank is pure arithmetic; after
    filters it is a rank over a window PARTITIONED by pid (parallel, never a
    single task).
    """
    from legate_pandas_spark.frontend.frame import ROW_ORDER

    spark = sdf.sparkSession
    pid = F.shiftright(F.col(ROW_ORDER), _PID_BITS)
    if fresh:
        local = F.col(ROW_ORDER) - F.shiftleft(pid, _PID_BITS)
    else:
        w = Window.partitionBy(pid).orderBy(F.asc(ROW_ORDER))
        local = F.row_number().over(w) - 1
    counts = (
        sdf.groupBy(pid.alias("__pid__"))
        .agg(F.count(F.lit(1)).alias("__cnt__"))
        .orderBy("__pid__")
        .collect()
    )
    offsets, triples, total = [], [], 0
    for r in counts:
        offsets.append((r["__pid__"], total))
        triples.append((r["__pid__"], total, r["__cnt__"]))
        total += r["__cnt__"]
    if not offsets:
        offsets = [(0, 0)]
    uniq = next(_pos_seq)
    pid_col, off_col = f"__pid_{uniq}__", f"__off_{uniq}__"
    off = spark.createDataFrame(offsets, schema=f"{pid_col} long, {off_col} long")
    out = (
        sdf.withColumn(pid_col, pid)
        .join(F.broadcast(off), pid_col, "left")
        .withColumn(pos_name, (local + F.coalesce(F.col(off_col), F.lit(0))).cast("long"))
        .drop(pid_col, off_col)
    )
    if with_offsets:
        return out, total, triples
    return out, total


class LocIndexer:
    def __init__(self, df):
        self._df = df

    def _index_col(self):
        if not self._df._index:
            raise ValueError("loc requires a stored index (set_index first)")
        return self._df._index[0]

    def __getitem__(self, key):
        from legate_pandas_spark.frontend.frame import DataFrame
        from legate_pandas_spark.frontend.series import Series

        df = self._df
        cols = None
        if isinstance(key, tuple):
            key, cols = key
        if isinstance(key, Series):  # boolean mask
            out = df[key]
        elif isinstance(key, slice):
            idx = self._index_col()
            cond = None
            if key.start is not None:
                cond = F.col(idx) >= key.start
            if key.stop is not None:
                c2 = F.col(idx) <= key.stop  # loc slices are inclusive (pandas)
                cond = c2 if cond is None else cond & c2
            out = DataFrame(df._sdf.filter(cond) if cond is not None else df._sdf, df._index)
            # label filters are null-rejecting comparisons: carry + prove idx
            out._nonnull_cols = frozenset(df._nonnull_cols) | (
                {idx} if cond is not None else frozenset()
            )
        elif isinstance(key, (list, tuple)):  # label list → isin filter
            idx = self._index_col()
            out = DataFrame(df._sdf.filter(F.col(idx).isin(list(key))), df._index)
            out._nonnull_cols = frozenset(df._nonnull_cols) | {idx}
        else:  # single label → rows with that index value
            idx = self._index_col()
            out = DataFrame(df._sdf.filter(F.col(idx) == key), df._index)
            out._nonnull_cols = frozenset(df._nonnull_cols) | {idx}
        if cols is not None:
            if isinstance(cols, str):
                return out[cols]
            return out[list(cols)]
        return out

    def __setitem__(self, key, value) -> None:
        """Scatter update: ``df.loc[mask, col] = scalar/Series`` (reference
        scatter_by_mask.cc) or ``df.loc[label, col] = scalar`` (reference
        write_at, core/table.py:697-762) — both copy-on-write conditional
        projections."""
        from legate_pandas_spark.frontend.series import Series

        if not (isinstance(key, tuple) and len(key) == 2):
            raise NotImplementedError("loc assignment requires df.loc[rows, column] = value")
        rows, col = key
        if isinstance(rows, Series):
            cond = rows._col
        else:  # scalar index label
            cond = F.col(self._index_col()) == F.lit(rows)
        val = value._col if isinstance(value, Series) else F.lit(value)
        base = F.col(col) if col in self._df._sdf.columns else F.lit(None)
        self._df._sdf = self._df._sdf.withColumn(col, F.when(cond, val).otherwise(base))
        self._df._nonnull_cols = self._df._nonnull_cols - {col}


class ILocIndexer:
    def __init__(self, df):
        self._df = df

    def __getitem__(self, key):
        from legate_pandas_spark.frontend.frame import ROW_ORDER, DataFrame

        df = self._df
        cols = None
        if isinstance(key, tuple):
            key, cols = key
        fresh = ROW_ORDER not in df._sdf.columns
        sdf = df._ordered_sdf()
        with_pos, total = _attach_positions(sdf, fresh)
        if isinstance(key, slice):
            start = key.start or 0
            if start < 0:
                start = max(total + start, 0)
            stop = key.stop
            if stop is not None and stop < 0:
                stop = total + stop
            cond = F.col("__pos__") >= start
            if stop is not None:
                cond = cond & (F.col("__pos__") < stop)  # iloc stop exclusive
            out = df._carry_proofs(df._replace(with_pos.filter(cond).drop("__pos__")))
        elif isinstance(key, int):
            if key < 0:
                key = total + key  # total came free with the offsets aggregate
            if key < 0 or key >= total:
                raise IndexError("single positional indexer is out-of-bounds")
            out = df._carry_proofs(
                df._replace(with_pos.filter(F.col("__pos__") == key).drop("__pos__"))
            )
        elif isinstance(key, (list, tuple)):
            # pandas iloc honors the REQUESTED order and repeats — an isin
            # filter would return ascending unique positions. Broadcast-join a
            # driver-built (position, output_rank) frame (the key list is
            # driver-resident by construction) and make the rank the new
            # row-order key.
            positions = [int(p) if p >= 0 else total + int(p) for p in key]
            # pandas raises rather than silently dropping rows that would
            # fall out of the inner join below (total is already driver-side)
            if any(p < 0 or p >= total for p in positions):
                raise IndexError("positional indexers are out-of-bounds")
            want = with_pos.sparkSession.createDataFrame(
                list(enumerate(positions)) or [(0, -1)],
                schema="__takerank__ long, __pos__ long",
            )
            taken = (
                with_pos.drop(ROW_ORDER)
                .join(F.broadcast(want), "__pos__", "inner")
                .withColumn(ROW_ORDER, F.col("__takerank__"))
                .drop("__pos__", "__takerank__")
            )
            out = df._replace(taken)
        else:
            raise TypeError(f"unsupported iloc key: {type(key)!r}")
        if cols is not None:
            if isinstance(cols, int):
                return out[df.columns[cols]]
            if isinstance(cols, list):
                names = [df.columns[c] if isinstance(c, int) else c for c in cols]
                return out[names]
            return out[cols]
        return out


class AtIndexer:
    """Scalar read/write (reference read_at/write_at tasks,
    src/copy/tasks/read_at.cc, write_at.cc; core/table.py:697-762)."""

    def __init__(self, df, positional: bool = False):
        self._df = df
        self._positional = positional

    def __getitem__(self, key):
        if not (isinstance(key, tuple) and len(key) == 2):
            raise TypeError("at/iat require (row, column)")
        row, col = key
        if self._positional:
            sub = self._df.iloc[row, col] if isinstance(col, int) else self._df.iloc[row][col]
        else:
            sub = self._df.loc[row, col]
        vals = sub._frame._sdf.select(sub._col.alias("v")).collect()
        if not vals:
            raise KeyError(f"no row for {key!r}")
        return vals[0][0]

    def __setitem__(self, key, value) -> None:
        """Scalar write: copy-on-write conditional projection on the one
        matching row (reference write_at copies all pieces and updates one,
        src/copy/tasks/write_at.cc — here a single ``when`` over the plan)."""
        if not (isinstance(key, tuple) and len(key) == 2):
            raise TypeError("at/iat require (row, column)")
        row, col = key
        df = self._df
        if self._positional:
            from legate_pandas_spark.frontend.frame import ROW_ORDER

            name = df.columns[col] if isinstance(col, int) else col
            fresh = ROW_ORDER not in df._sdf.columns
            sdf = df._ordered_sdf()
            with_pos, total = _attach_positions(sdf, fresh)
            if row < 0:
                row = total + row
            df._sdf = with_pos.withColumn(
                name, F.when(F.col("__pos__") == row, F.lit(value)).otherwise(F.col(name))
            ).drop("__pos__")
            df._nonnull_cols = df._nonnull_cols - {name}
        else:
            name = col
            idx = df._index[0] if df._index else None
            if idx is None:
                raise ValueError("at requires a stored index (set_index first)")
            df._sdf = df._sdf.withColumn(
                name, F.when(F.col(idx) == F.lit(row), F.lit(value)).otherwise(F.col(name))
            )
            df._nonnull_cols = df._nonnull_cols - {name}
