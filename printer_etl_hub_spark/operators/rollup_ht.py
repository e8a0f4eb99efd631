"""Hypertable-style multi-resolution time rollups (continuous aggregates).

The pattern behind TimescaleDB continuous aggregates / druid rollups: keep
a ladder of time resolutions (minute → hour → day) where EACH COARSER LEVEL
AGGREGATES THE FINER LEVEL, not the raw table. At 100 TB the daily rollup
then reads |minutes| rows instead of |events| rows — the input to each
level shrinks by orders of magnitude, and incremental refresh only touches
buckets the watermark has passed.

Correctness requirement: every aggregate must be MERGEABLE — counts add,
decimal sums add exactly (plans/common.py discipline), min/max compose.
Averages are derived (sum/count) at read time, never stored. The q48 gate
proves the ladder is exact: day-level computed minute→hour→day must
hash-match the oracle's direct day aggregation of raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    resolutions: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
) -> dict[str, DataFrame]:
    """Build the rollup ladder. Returns {resolution: frame} where each frame
    has: bucket_start (timestamp), *key_cols, n (count), sum_value (DEC —
    cast to double only at the final read)."""
    out: dict[str, DataFrame] = {}
    finest = resolutions[0]
    cur = (
        df.groupBy(F.window(F.col(ts_col), finest).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast(DEC)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), *key_cols, "n", "sum_value")
    )
    out[finest] = cur
    for res in resolutions[1:]:
        # AGGREGATE THE PREVIOUS LEVEL — partial counts/sums merge exactly
        cur = (
            cur.groupBy(F.window(F.col("bucket_start"), res).alias("w"), *key_cols)
            .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
            .select(F.col("w.start").alias("bucket_start"), *key_cols, "n", "sum_value")
        )
        out[res] = cur
    return out
