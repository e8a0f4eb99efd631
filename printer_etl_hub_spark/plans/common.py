"""Cross-engine determinism helpers.

Float aggregation order differs between Spark (partial aggs, partition order)
and DuckDB — a raw SUM(double) diverges in the low bits and breaks the
oracle's value-hash. Every oracle-compared double aggregation therefore sums
EXACT decimals and casts the result back to double:

    Spark:  F.sum(expr.cast("decimal(25,6)")).cast("double")
    DuckDB: CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS DOUBLE)

Per-row double arithmetic is IEEE-identical across engines, so row-level
expressions stay plain doubles. This costs ~nothing at scale (decimal adds
are still partial-aggregable map-side) and buys bit-exact reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column) -> Column:
    """Order-insensitive exact sum of a double expression, as double."""
    return F.sum(col.cast(DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def ts_str(col: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Render a timestamp as a string (UTC session) — engine-portable output."""
    return F.date_format(col, fmt)
