"""Engine-independent deterministic aggregation helpers.

Floating-point sums depend on accumulation order, which differs between
Spark (partial aggregation across partitions) and any oracle engine.
Casting each row to a fixed-scale decimal BEFORE summing makes the sum
exact integer arithmetic — order-independent and bit-identical across
engines — and the final cast back to double is exact for values well
under 2^53. Use these for every value that a correctness oracle will
hash-compare; plain F.sum/F.avg are fine for bench-only paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent sum: per-row decimal cast, exact sum, double out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent mean: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c)
    )


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """The matching ANSI-SQL fragment for :func:`dsum` (DuckDB oracle)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
