"""Stream-stream joins (event-time interval attribution).

The canonical streaming-join shape a telemetry/attribution pipeline needs:
join two live streams on a key with a bounded event-time gap ("click within
N minutes after the view"). Structured Streaming keeps both sides' state,
bounded by the watermarks + the time-range predicate (Spark derives the
state eviction condition from the interval bounds); the SAME function runs
on plain DataFrames as the batch oracle.

Scale: state is O(events inside the watermark horizon) per side; the join
shuffles both streams by the key. Without the time-range bound the state
would be unbounded — the interval predicate is load-bearing, not cosmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attributed_clicks(
    views: DataFrame,
    clicks: DataFrame,
    *,
    key: str = "user_id",
    max_delay: str = "10 minutes",
    view_watermark: str = "20 minutes",
    click_watermark: str = "20 minutes",
    streaming: bool = False,
    how: str = "inner",
) -> DataFrame:
    """Clicks joined to the view they follow within ``max_delay``.

    Output: (user_id, view_id, click_id, view_ts, click_ts, delay_s).
    ``streaming=True`` adds the watermarks required for state cleanup on a
    stream-stream join; the logical join is identical in batch.
    ``how="left_outer"`` additionally emits never-clicked views (click
    columns null) — in streaming these rows emit once the watermark passes
    the view's match horizon (Spark's no-data micro-batches flush them).
    """
    if streaming:
        views = views.withWatermark("ts", view_watermark)
        clicks = clicks.withWatermark("ts", click_watermark)
    v = views.select(
        F.col(key).alias("v_key"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col(key).alias("c_key"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = v.join(
        c,
        (F.col("v_key") == F.col("c_key"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}")),
        how,
    )
    return joined.select(
        F.col("v_key").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")).alias("delay_s"),
    )
