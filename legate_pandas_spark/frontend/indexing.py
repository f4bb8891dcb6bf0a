"""loc/iloc/at/iat indexers (reference frontend/indexing.py:135-705).

The reference binary-searches index bounds then range-slices regions
(core/index.py:385-417 FIND_BOUNDS, src/copy/tasks/slice_by_range.cc). On Spark:

* label slicing (loc) on a stored index → a pushed-down range filter (no binary
  search needed — parquet min/max stats prune row groups, which IS the
  distributed binary search).
* positional slicing (iloc) needs a global row number — materialized with a
  window over the partition-stable row-order key. This single-tasks the ordering
  at scale and exists for API parity; at 100 TB use loc on an index instead
  (same guidance the reference gives for its RangeIndex laziness).
* scatter updates (``df.loc[mask, col] = v``) → copy-on-write conditional
  projection (reference scatter_by_mask, core/table.py:697-762).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window


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
        else:  # single label → rows with that index value
            idx = self._index_col()
            out = DataFrame(df._sdf.filter(F.col(idx) == key), df._index)
        if cols is not None:
            if isinstance(cols, str):
                return out[cols]
            return out[list(cols)]
        return out

    def __setitem__(self, key, value) -> None:
        """Scatter update: df.loc[mask, col] = scalar/Series (copy-on-write
        conditional projection, reference scatter_by_mask.cc)."""
        from legate_pandas_spark.frontend.series import Series

        if not (isinstance(key, tuple) and len(key) == 2):
            raise NotImplementedError("loc assignment requires df.loc[mask, column] = value")
        mask, col = key
        if not isinstance(mask, Series):
            raise NotImplementedError("loc assignment mask must be a boolean Series")
        val = value._col if isinstance(value, Series) else F.lit(value)
        base = F.col(col) if col in self._df._sdf.columns else F.lit(None)
        self._df._sdf = self._df._sdf.withColumn(col, F.when(mask._col, val).otherwise(base))


class ILocIndexer:
    def __init__(self, df):
        self._df = df

    def __getitem__(self, key):
        from legate_pandas_spark.frontend.frame import ROW_ORDER, DataFrame

        df = self._df
        cols = None
        if isinstance(key, tuple):
            key, cols = key
        sdf = df._ordered_sdf()
        pos = F.row_number().over(Window.orderBy(F.asc(ROW_ORDER))) - 1
        with_pos = sdf.withColumn("__pos__", pos)
        if isinstance(key, slice):
            start = key.start or 0
            cond = F.col("__pos__") >= start
            if key.stop is not None:
                cond = cond & (F.col("__pos__") < key.stop)  # iloc stop exclusive
            out = DataFrame(with_pos.filter(cond).drop("__pos__"), df._index)
        elif isinstance(key, int):
            n = None
            if key < 0:
                n = sdf.count()
                key = n + key
            out = DataFrame(with_pos.filter(F.col("__pos__") == key).drop("__pos__"), df._index)
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
    """Scalar read (reference read_at task, src/copy/tasks/read_at.cc)."""

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
