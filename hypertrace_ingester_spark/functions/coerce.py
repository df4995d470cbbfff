"""P14 value coercion — ValueCoercer analog as pure column expressions
(hypertrace-trace-enricher/trace-reader/.../ValueCoercer.java:14-122,
mirrored against its unit tests in tests/test_operators_misc.py).

The reference coerces raw attribute strings into typed literals with
java.lang parsing semantics; the column forms reproduce them JVM-side:

- BOOL:   only ``true``/``false`` case-insensitive parse; anything else
          is null (Boolean.parseBoolean's permissive false is NOT used).
- INT64:  strict integral strings (Long.valueOf — no decimals, optional
          sign); doubles truncate toward zero (Number.longValue()).
- DOUBLE: Double.valueOf strings (decimals, exponents).
- TIMESTAMP: epoch-millis integral string FIRST, else ISO-8601 instant;
          result is epoch millis (the reference emits a long literal).
- STRING: identity (bytes treated the same).

Unparseable input → null, mirroring Optional.empty().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INTEGRAL = r"^[+-]?\d+$"


def coerce_bool(col: Column) -> Column:
    low = F.lower(col)
    return F.when(low == "true", F.lit(True)).when(low == "false", F.lit(False))


def coerce_long(col: Column) -> Column:
    return F.when(col.rlike(_INTEGRAL), col.cast("long"))


def coerce_double(col: Column) -> Column:
    return col.try_cast("double")


def coerce_timestamp_ms(col: Column) -> Column:
    """Epoch-millis string first (tryParseLong), else ISO-8601 instant →
    epoch millis (ValueCoercer.java TYPE_TIMESTAMP branch)."""
    return F.when(col.rlike(_INTEGRAL), col.cast("long")).otherwise(
        F.unix_millis(col.try_cast("timestamp"))
    )


def coerce(col: Column, kind: str) -> Column:
    """Dispatch by AttributeKind name (lowercased, TYPE_ prefix dropped)."""
    kind = kind.lower().removeprefix("type_")
    if kind in ("string", "bytes"):
        return col.cast("string")
    if kind == "bool":
        return coerce_bool(col)
    if kind == "int64":
        return coerce_long(col)
    if kind == "double":
        return coerce_double(col)
    if kind == "timestamp":
        return coerce_timestamp_ms(col)
    raise ValueError(f"unsupported attribute kind {kind!r}")
