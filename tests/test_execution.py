"""bounded_tail / loop_execution posture tests (r13 optimization).

The daily-series statistics family routes its index-scale tail through
``execution.bounded_tail``: the |days|-bounded head is checkpointed once
(one corpus pass instead of one per tail consumer) and the tail executes
eagerly under the loop posture (AQE off, shuffle width derived from the
head's actual row count). The plan-hygiene suites flip ``EAGER_TAILS``
off to keep walking the full lazy plan — so THIS module pins the
contract that makes that sound: eager and lazy produce IDENTICAL rows
in identical order, and the posture always restores the session confs.
"""

from __future__ import annotations

import pytest

from printer_etl_hub_spark import execution
from printer_etl_hub_spark.plans import REGISTRY
from printer_etl_hub_spark.plans.common import flush_pending_release

from conftest import SF_SMOKE

#: Every registry query converted to the bounded_tail posture. Keep in
#: sync when converting more — the equivalence sweep below runs each on
#: both paths.
BOUNDED_TAIL_QUERIES = [
    "q249_daily_acf",
    "q289_pettitt",
    "q295_ljung_box",
    "q296_binned_drift",
    "q297_durbin_watson",
    "q299_runs_test",
    "q305_chow_test",
    "q306_classical_decomposition",
    "q307_forecast_scorecard",
    "q310_friedman_kendall_w",
    "q292_logrank",
    "q254_pca_scores",
    "q259_hits",
    "q234_join_cardinality",
]

#: Posture-converted queries whose declared output carries NO ORDER BY
#: (the oracle gate sorts rows before hashing) — compared as sorted sets.
UNORDERED_POSTURE_QUERIES = [
    "q242_lang_propagation",
    "q245_pca_power",
]


@pytest.mark.parametrize(
    "name", BOUNDED_TAIL_QUERIES + UNORDERED_POSTURE_QUERIES
)
def test_bounded_tail_eager_equals_lazy(spark, name):
    """The production (eager, posture) path must return exactly the lazy
    path's rows — in the same order for the ORDER BY queries (stricter
    than the gate needs), as sorted sets for the declared-unordered
    ones."""
    spark.catalog.clearCache()
    flush_pending_release()
    old = execution.EAGER_TAILS
    try:
        execution.EAGER_TAILS = True
        eager = [tuple(r) for r in REGISTRY[name].fn(spark, SF_SMOKE).collect()]
        spark.catalog.clearCache()
        flush_pending_release()
        execution.EAGER_TAILS = False
        lazy = [tuple(r) for r in REGISTRY[name].fn(spark, SF_SMOKE).collect()]
    finally:
        execution.EAGER_TAILS = old
        spark.catalog.clearCache()
        flush_pending_release()
    if name in UNORDERED_POSTURE_QUERIES:
        eager, lazy = sorted(eager), sorted(lazy)
    assert eager == lazy, name


def test_bounded_tail_restores_session_confs(spark):
    """The posture must restore AQE and the shuffle width on exit even
    when the build raises."""
    aqe0 = spark.conf.get("spark.sql.adaptive.enabled", "true")
    sp0 = spark.conf.get("spark.sql.shuffle.partitions", None)

    def boom(_df):
        raise RuntimeError("tail build failed")

    with pytest.raises(RuntimeError, match="tail build failed"):
        execution.bounded_tail(spark, spark.range(3), boom)
    assert spark.conf.get("spark.sql.adaptive.enabled", "true") == aqe0
    assert spark.conf.get("spark.sql.shuffle.partitions", None) == sp0


def test_bounded_tail_unpersists_pins_when_checkpoint_fails(spark):
    """r14 (ADVICE r13): if the result checkpoint job fails AFTER the
    build returned (the only point where pins can hold real blocks),
    the eager path must unpersist the build's pins before re-raising —
    previously they stayed cached for the life of the session."""
    from pyspark.sql import functions as F

    pin = spark.range(4).persist()

    def build(df):
        pin.count()  # materialize the pin's blocks, as a real tail would
        failing = df.select(
            F.when(F.col("id") >= 0, F.raise_error(F.lit("tail job failed")))
            .otherwise(F.lit("x"))
            .alias("boom")
        )
        return failing, [pin]

    with pytest.raises(Exception, match="tail job failed"):
        execution.bounded_tail(spark, spark.range(3), build)
    assert not pin.storageLevel.useMemory and not pin.storageLevel.useDisk
    # session confs restored too (the loop_execution finally)
    assert spark.conf.get("spark.sql.adaptive.enabled", "true") != "false"


def test_bounded_tail_runs_tail_under_posture(spark):
    """Inside the build, AQE must be off and the derived width must be 1
    for a tiny head — and the head must already be materialized (a
    LogicalRDD scan, not the original lineage)."""
    seen = {}

    def probe(df):
        seen["aqe"] = spark.conf.get("spark.sql.adaptive.enabled")
        seen["parts"] = spark.conf.get("spark.sql.shuffle.partitions")
        seen["plan"] = df._jdf.queryExecution().executedPlan().toString()
        return df.groupBy().count(), []

    out = execution.bounded_tail(spark, spark.range(5), probe)
    assert seen["aqe"] == "false"
    assert seen["parts"] == "1"
    assert "LogicalRDD" in seen["plan"] or "Scan ExistingRDD" in seen["plan"]
    assert out.collect()[0][0] == 5
