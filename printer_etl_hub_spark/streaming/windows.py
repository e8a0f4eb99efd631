"""Event-time windowing — batch and streaming share one logical plan.

The reference's operating model is an implicit polling stream: each pipeline
run is a micro-batch that overwrites per-printer state (last-value-wins,
`plugins/base.py:19-43`). Structured Streaming expresses that directly; the
transformations below are written against plain DataFrames so the SAME
function runs in batch (correctness oracle) and on a ``readStream`` frame
(incremental) — Spark's batch/streaming unification.

Scale: watermarks bound state; tumbling-window aggregation state is
O(|keys| × windows-in-flight); last-value-wins device state is O(fleet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def tumbling_counts(
    events: DataFrame, window: str = "5 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling event-time window counts/sums per event_type.

    Decimal-exact sums (cast→sum→double) so the batch run hash-matches the
    DuckDB oracle regardless of aggregation order.
    """
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_counts_stream(
    events_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming variant: watermark bounds state + drops late data."""
    return tumbling_counts(
        events_stream.withWatermark(ts_col, watermark), window, ts_col
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding event-time windows per event_type (each event lands in
    window/slide overlapping windows). Epoch-aligned starts, so a SQL
    oracle reproduces them with time_bucket arithmetic."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events_stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming variant: watermark bounds the overlapping-window state."""
    return sliding_counts(
        events_stream.withWatermark(ts_col, watermark), window, slide, ts_col
    )


def dedup_within_watermark_stream(
    events_stream: DataFrame,
    keys: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state for keys older than the
    watermark is evicted (batch dropDuplicates would keep ALL keys forever —
    unbounded state is the #1 streaming-job killer at scale)."""
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Session windows per user (gap-merged), batch or streaming.

    `session_window` merges events whose gaps are < ``gap`` — identical to
    the lag/cumsum sessionization a batch SQL oracle uses.
    """
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


def device_last_state_stream(updates: DataFrame, key: str = "user_id") -> DataFrame:
    """Last-value-wins state (the reference's read-modify-write per plugin,
    `plugins/base.py:19-43`): streaming dedup-to-latest per key.

    In batch: max_by(state, ts). In streaming this frame feeds
    ``foreachBatch`` + MERGE (or transformWithStateInPandas for richer
    per-key logic).
    """
    return updates.groupBy(key).agg(
        F.max_by(F.struct("*"), F.col("ts")).alias("latest")
    )


def pit_enrich_stream(
    events: DataFrame,
    versions: DataFrame,
    key: str = "c_custkey",
    date_col: str = "d",
) -> DataFrame:
    """Leakage-free point-in-time enrichment of an event stream — q217's
    feature-store join applied ONLINE: each event picks the dimension
    version effective AT ITS OWN TIMESTAMP (eff_from ≤ d < eff_to) via a
    stream-static equi-join on the key with the interval predicate as a
    residual filter. Joining "current" attributes onto a stream is the
    same silent label-leakage bug as in batch — worse, because online
    features silently diverge from the training-time join.

    ``versions`` is a static SCD2 frame (key, segment, eff_from,
    eff_to); Spark broadcasts or shuffles it like any dimension, and
    because the join is stateless (static side), no streaming state
    accrues. Works identically on a batch frame — the stream≡batch test
    aggregates the enriched stream and pins it to q217's output.
    """
    j = events.join(F.broadcast(versions), key)
    return j.filter(
        (F.col("eff_from") <= F.col(date_col))
        & (F.col(date_col) < F.col("eff_to"))
    )
