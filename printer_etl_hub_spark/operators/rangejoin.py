"""Bucketized range (interval) join.

A point-in-interval join (`l.ts BETWEEN r.start AND r.end`) has no equi-key,
so Spark plans it as BroadcastNestedLoopJoin — O(|L|·|R|) compares, the
classic scale killer. The bucketized rewrite makes it an equi-join:

    pick a bucket width W (≈ typical interval length)
    left:  bucket = floor(ts / W)                 (one row per point)
    right: explode sequence(floor(start/W), floor(end/W))  (one row per
           covered bucket — intervals spanning B buckets emit B rows)
    equi-join on bucket, then re-check the exact BETWEEN predicate

Each (point, interval) match is found exactly once (the point lives in ONE
bucket), so no dedup is needed. Cost: one shuffle on the bucket key and
|R| × avg-buckets-per-interval build rows — linear, AQE-skew-safe, instead
of a nested loop. Width trades fan-out (small W → many right rows) against
false candidates (large W → more post-filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    ts_col: str,
    right: DataFrame,
    start_col: str,
    end_col: str,
    width_seconds: int,
) -> DataFrame:
    """Inner-join left points to right intervals containing them
    (inclusive bounds). Output: all left columns + all right columns."""
    w = F.lit(width_seconds)

    def _epoch(c: str):
        # TIMESTAMP_NTZ can't cast straight to long; routing through
        # TIMESTAMP first is a no-op for regular timestamps and lossless
        # for NTZ under the engine's pinned UTC session timezone.
        return F.col(c).cast("timestamp").cast("long")

    lb = left.withColumn("_bucket", (_epoch(ts_col) / w).cast("long"))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (_epoch(start_col) / w).cast("long"),
                (_epoch(end_col) / w).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "_bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
