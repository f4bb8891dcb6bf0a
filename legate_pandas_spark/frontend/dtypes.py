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
    """Map a pandas dtype (string or numpy dtype) to a Spark SQL type name."""
    name = str(dtype)
    if name in PANDAS_TO_SPARK:
        return PANDAS_TO_SPARK[name]
    if name.startswith("datetime64"):
        return "timestamp"
    raise TypeError(f"unsupported dtype for this engine: {dtype!r} (SURVEY §1.2)")


def is_numeric_spark_type(spark_type: str) -> bool:
    base = spark_type.split("(")[0]
    return base in _NUMERIC_SPARK


def null_compare_false(cmp: Column) -> Column:
    """pandas comparison semantics: NULL operands compare False, result is
    non-nullable boolean (reference core/runtime.py:142)."""
    return F.coalesce(cmp, F.lit(False))


def truediv(left: Column, right: Column) -> Column:
    """pandas promotion: division is always float (int/int → float64), unlike
    SQL engines that may produce decimals (reference common/types.py:432-442)."""
    return left.cast("double") / right.cast("double")


def floordiv(left: Column, right: Column) -> Column:
    return F.floor(left.cast("double") / right.cast("double")).cast("double")
