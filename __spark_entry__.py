"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the engine's full declared query surface
(printer_etl_hub_spark/plans/registry.py) for the DuckDB differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from printer_etl_hub_spark.plans import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001."""
    return REGISTRY["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def _gate_wrapped(name: str, fn: Callable) -> Callable[[SparkSession, str], DataFrame]:
    """Release the PREVIOUS query's persisted frames at entry to the next
    one: several operators persist() a shared subtree that the returned
    lazy frame still references (so they cannot unpersist before the
    caller's action), and across a 50-query gate session those caches
    would otherwise accumulate for the SparkSession's lifetime. Clearing
    at call entry is safe — the prior query's result was already
    materialized by the harness — and is the same idiom bench.py uses
    per attempt."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from printer_etl_hub_spark.plans.common import flush_pending_release

        spark.catalog.clearCache()
        flush_pending_release()  # drop deferred pin references too
        return fn(spark, sf_dir)

    run.__name__ = name
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: _gate_wrapped(name, spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return {
        name: spec.oracle_sql
        for name, spec in REGISTRY.items()
        if spec.oracle_sql is not None
    }
