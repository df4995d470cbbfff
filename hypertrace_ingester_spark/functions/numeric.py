"""Numeric helpers with cross-engine-deterministic semantics.

``F.round`` rounds the double's shortest decimal representation HALF_UP
(JVM BigDecimal.valueOf), while DuckDB/C libraries round the raw binary
double — the two disagree on exact .xx5 boundaries (common for int/int
ratios). ``round_half_up`` instead computes floor(x·10^s + 0.5)/10^s on
both engines: identical IEEE-754 op sequences give identical results, so
oracle comparison is exact. Positive-domain only (floor, not trunc).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int) -> Column:
    """Deterministic half-up rounding for non-negative values."""
    factor = float(10**scale)
    return F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def sql_round_half_up(expr: str, scale: int) -> str:
    """The same formula as ANSI/DuckDB SQL text (for oracle queries)."""
    factor = 10**scale
    return f"floor(({expr}) * {factor} + 0.5) / {factor}"
