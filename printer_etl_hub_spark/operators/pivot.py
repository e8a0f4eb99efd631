"""Pivot operators (reference A1 varbind pivot, A7 first-per-slot fill).

A1: SNMP walks arrive as (idx, column_number, value) varbind rows and are
pivoted one-wide-row-per-supply (`adapters/snmp_toner.py:91-105`).
A7: the report fills one slot per normalized color with the first cartridge
seen (`core/excel/update_from_json.py:88-107`) — order made explicit here.

Always pass explicit pivot values: without them Spark runs an extra
distinct-collect job over the full dataset to discover the columns —
a needless full scan at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def varbind_pivot(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence,
    value_col: str = "value",
    prefix: str = "c",
) -> DataFrame:
    """A1: pivot (group, pivot_col, value) rows to one wide row per group.

    ``first(ignorenulls)`` per cell — each (group, column) pair appears at
    most once in a walk; explicit pivot values keep it a single pass.
    """
    out = (
        df.groupBy(*group_cols)
        .pivot(pivot_col, list(pivot_values))
        .agg(F.first(value_col, ignorenulls=True))
    )
    for v in pivot_values:
        out = out.withColumnRenamed(str(v), f"{prefix}{v}")
    return out


def first_per_slot_pivot(
    df: DataFrame,
    group_cols: Sequence[str],
    slot_col: str,
    slot_values: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
) -> DataFrame:
    """A7: per group, fill one column per slot with the FIRST value in an
    explicit order. row_number over (group, slot) then pivot of rank-1 rows.
    """
    w = Window.partitionBy(*group_cols, slot_col).orderBy(*order_by)
    firsts = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, slot_col, value_col)
    )
    out = (
        firsts.groupBy(*group_cols)
        .pivot(slot_col, list(slot_values))
        .agg(F.first(value_col, ignorenulls=True))
    )
    return out
