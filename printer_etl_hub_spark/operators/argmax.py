"""Argmax / top-k per group (reference A2-A4, W4-W5).

The reference picks "best" rows with ordered linear scans
(`adapters/snmp_alerts.py:152-179`, `adapters/ews_alerts.py:259-284`,
`adapters/ledm_client.py:96-109`). In Spark these are window row_number
(general top-k) or max_by (top-1, cheaper: a partial-aggregable hash agg,
no sort). At 100 TB prefer argmax_per_group for k=1 — it map-side combines
instead of shuffling every row into a per-key sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group with a deterministic total order.

    ``order_by`` MUST be a total order (include a unique tiebreak column) —
    Spark has no implicit row order, so non-total orders are nondeterministic
    (SURVEY.md §7 watch list).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def argmax_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column,
    payload: dict[str, Column],
) -> DataFrame:
    """Top-1 per group via max_by(struct(payload), key) — hash aggregation,
    map-side partial combine, no per-group sort. ``key`` must be a total
    order (use struct(rank, tiebreak)).
    """
    payload_struct = F.struct(*[c.alias(n) for n, c in payload.items()])
    agg = df.groupBy(*group_cols).agg(F.max_by(payload_struct, key).alias("_best"))
    return agg.select(*group_cols, *[F.col(f"_best.{n}").alias(n) for n in payload])
