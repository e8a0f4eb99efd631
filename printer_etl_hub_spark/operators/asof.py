"""Two-table as-of join (point-in-time lookup).

Spark has no native ASOF JOIN; the naive rewrite (range theta-join +
aggregate) shuffles the cross-product of time-adjacent rows. The scalable
composition used here is the UNION trick:

    tag left rows side=1, right rows side=0
    union on (key, ts), one window per key ordered by (ts, side, seq)
    running last(right_payload, ignorenulls) → each left row sees the
    latest right row with r.ts <= l.ts
    filter back to left rows

Cost: ONE shuffle on the key (the same shuffle any per-key window needs),
no join at all — the right side rides along in a struct column. This is the
standard trades/quotes shape and survives any corpus size where (key-local
history) sorts in executor memory; AQE skew handling covers hot keys.

Determinism: ties inside the right side must be resolved BEFORE the join —
callers dedupe to one right row per (key, ts) (see q46) or accept
last-by-seq; ties between left and right at the same ts resolve to
INCLUSIVE (right sorts first), matching DuckDB's `ASOF JOIN ... ON l.ts >=
r.ts` oracle semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    payload_cols: list[str],
    payload_prefix: str = "r_",
) -> DataFrame:
    """Backward (inclusive) as-of join: attach to every left row the most
    recent right row with ``right.ts_col <= left.ts_col`` per ``on`` key.

    Output = all left columns + ``payload_prefix + c`` for each payload col
    (null when no right row precedes).
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols, F.lit(1).alias("_side"), F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload")
    )
    unioned = l.unionByName(r.select(*[c for c in (on, ts_col)], "_side", "_payload"), allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    attached = unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = attached.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_asof").getField(c).alias(payload_prefix + c) for c in payload_cols],
    )
    return out
