"""pandas ↔ Spark dtype mapping and promotion policy (SURVEY §1.2).

The reference type system (common/types.py): bool, int8-64, uint8-64, float32/64,
datetime64[ns], string, category. Spark has no unsigned ints — they widen
(uint8→short, uint16→int, uint32→long, uint64→long with documented overflow), and
datetime64[ns] becomes microsecond TimestampType (documented truncation).
Categories are carried as plain strings (dictionary encoding is Tungsten's
concern; SURVEY §1.1).

Null semantics: pandas comparisons are non-nullable and null-compare-false
(reference core/runtime.py:142, core/column.py:424-441) — ``null_compare_false``
wraps Spark's three-valued comparison back to pandas' two-valued one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

PANDAS_TO_SPARK = {
    "bool": "boolean",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "int": "long",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "long",
    "uint64": "long",
    "float32": "float",
    "float64": "double",
    "float": "double",
    "datetime64[ns]": "timestamp",
    "datetime64[us]": "timestamp",
    "str": "string",
    "string": "string",
    "object": "string",
    "category": "string",
}

_NUMERIC_SPARK = {"tinyint", "smallint", "int", "bigint", "long", "float", "double", "decimal"}


def to_spark_type(dtype) -> str:
    """Map a pandas dtype (string, numpy dtype, or numpy scalar type like
    ``np.int64``) to a Spark SQL type name."""
    name = str(dtype)
    if name not in PANDAS_TO_SPARK and isinstance(dtype, type):
        import numpy as np

        try:
            name = str(np.dtype(dtype))  # np.int64 → 'int64'
        except TypeError:
            pass
    if name in PANDAS_TO_SPARK:
        return PANDAS_TO_SPARK[name]
    if name.startswith("datetime64"):
        return "timestamp"
    raise TypeError(f"unsupported dtype for this engine: {dtype!r} (SURVEY §1.2)")


def is_numeric_spark_type(spark_type: str) -> bool:
    base = spark_type.split("(")[0]
    return base in _NUMERIC_SPARK


class CatMeta:
    """Categorical dtype metadata (reference CategoricalDtype,
    common/types.py:135-190; categories are string-only, :181-182).

    Physical storage stays StringType (SURVEY §1.1); this records the logical
    dictionary. ``categories=None`` = inferred domain (lazy — derived from
    distinct values only when an op needs it, via the broadcast-dictionary
    join); a declared list is the reference's replicated dictionary
    (core/column.py:1300-1341) and compiles straight into expressions with no
    driver collect (the user supplied the list)."""

    __slots__ = ("categories", "ordered")

    def __init__(self, categories: list | None = None, ordered: bool = False):
        self.categories = list(categories) if categories is not None else None
        self.ordered = bool(ordered)

    def code_expr(self, col: Column) -> Column:
        """0-based code in declared-category order; nulls/unknowns → -1."""
        if self.categories is None:
            raise ValueError("code_expr requires declared categories")
        arr = F.array(*[F.lit(c) for c in self.categories])
        return (F.coalesce(F.array_position(arr, col), F.lit(0)) - 1).cast("int")

    def __eq__(self, other):
        return (
            isinstance(other, CatMeta)
            and self.categories == other.categories
            and self.ordered == other.ordered
        )

    def __repr__(self):
        return f"CatMeta(categories={self.categories!r}, ordered={self.ordered})"


def null_compare_false(cmp: Column) -> Column:
    """pandas comparison semantics: NULL operands compare False, result is
    non-nullable boolean (reference core/runtime.py:142)."""
    return F.coalesce(cmp, F.lit(False))


def truediv(left: Column, right: Column) -> Column:
    """pandas promotion: division is always float (int/int → float64), unlike
    SQL engines that may produce decimals (reference common/types.py:432-442)."""
    return left.cast("double") / right.cast("double")


def floordiv(left: Column, right: Column) -> Column:
    """CPython/numpy float_divmod form, NOT floor(a/b): q is derived from the
    fmod remainder so that q*b + r == a stays consistent with floormod.
    The two differ on subnormal edges — CPython's -5e-324 // 2.0 is -1.0
    (fmod gives -5e-324, wrong sign -> r += b, q -= 1) while floor(a/b)
    underflows to -0.0 (hypothesis-found). The 0.5 guard is CPython
    float_divmod's floor-rounding correction verbatim."""
    a = left.cast("double")
    b = right.cast("double")
    base = F.try_mod(a, b)
    adj = ((base < 0) != (b < 0)) & (base != 0)
    div = (a - base) / b - F.when(adj, F.lit(1.0)).otherwise(F.lit(0.0))
    fd0 = F.floor(div).cast("double")
    return F.when(b == 0, F.floor(a / b).cast("double")).otherwise(
        F.when(div - fd0 > 0.5, fd0 + 1).otherwise(fd0)
    )


def floormod(left: Column, right: Column) -> Column:
    """Python/pandas FLOORED modulo (result sign follows the divisor) —
    Spark's ``%`` truncates toward zero, so -7 % 3 would be -1 instead of
    pandas' 2. Mirrors CPython float_rem exactly: r = fmod(a, b); if r is
    nonzero with the wrong sign, r += b. (The earlier
    ``try_mod(try_mod(a,b)+b, b)`` identity re-modded the sum, which turns a
    subnormal remainder into 0 where CPython returns b: 2.2e-313 % -3.0 is
    -3.0, because r+b rounds to b and CPython does NOT normalize it away —
    hypothesis-found edge.) A zero divisor yields null (documented
    divergence: numpy int % 0 is 0)."""
    base = F.try_mod(left, right)
    wrong_sign = ((base < 0) != (right < 0)) & (base != 0)
    return F.when(wrong_sign, base + right).otherwise(base)


def resolve_ewm_alpha(alpha=None, com=None, span=None, halflife=None) -> float:
    """pandas ewm parameter resolution: exactly one of alpha/com/span/halflife,
    converted to the smoothing factor (pandas.core.window.ewm semantics:
    alpha = 1/(1+com) = 2/(span+1) = 1 - exp(-ln2/halflife))."""
    import math

    given = [
        n
        for n, v in (
            ("alpha", alpha),
            ("com", com),
            ("span", span),
            ("halflife", halflife),
        )
        if v is not None
    ]
    if len(given) != 1:
        raise ValueError(
            "ewm: pass exactly one of alpha, com, span, halflife "
            f"(got {given or 'none'})"
        )
    if alpha is not None:
        if not 0 < alpha <= 1:
            raise ValueError("ewm: alpha must be in (0, 1]")
        return float(alpha)
    if com is not None:
        if com < 0:
            raise ValueError("ewm: com must be >= 0")
        return 1.0 / (1.0 + float(com))
    if span is not None:
        if span < 1:
            raise ValueError("ewm: span must be >= 1")
        return 2.0 / (float(span) + 1.0)
    if halflife <= 0:
        raise ValueError("ewm: halflife must be > 0")
    return 1.0 - math.exp(-math.log(2.0) / float(halflife))
