"""Streaming tests: batch/stream equivalence of the windowed operators.

The same transformation functions (streaming/windows.py) run over a batch
frame and over a file-source stream; results must converge to the batch
answer — Spark's unification contract, and the reference's poll-cycle
semantics (each run is one micro-batch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from printer_etl_hub_spark.streaming.windows import (
    device_last_state_stream,
    sessionized,
    tumbling_counts,
    tumbling_counts_stream,
)
from printer_etl_hub_spark.tables import load_tables

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, SF_SMOKE)["events"]


def test_tumbling_batch_rows(events):
    out = tumbling_counts(events, "5 minutes")
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == events.count()


def test_sessionize_batch(events):
    out = sessionized(events, "30 minutes").collect()
    assert sum(r["n_events"] for r in out) == events.count()
    # session count per user is bounded by event count
    users = events.select("user_id").distinct().count()
    assert len(out) >= users


def test_last_state(events):
    out = device_last_state_stream(events, "user_id")
    rows = out.collect()
    assert len(rows) == events.select("user_id").distinct().count()
    # the latest struct really is the max-ts row
    one = rows[0]
    uid = one["user_id"]
    max_ts = events.filter(F.col("user_id") == uid).agg(F.max("ts")).collect()[0][0]
    assert one["latest"]["ts"] == max_ts


def test_stream_equals_batch(spark, events, tmp_path):
    """File-source stream of the same parquet rows → identical window aggs."""
    src = str(tmp_path / "stream_src")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = tumbling_counts_stream(stream, "5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
    finally:
        q.stop()
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(events, "5 minutes").collect()
    }
    assert got == want
