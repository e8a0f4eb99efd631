"""Bucketed co-located joins: the write-once-shuffle storage path.

The assertion that matters: joining two tables bucketed on the join key
produces a SortMergeJoin with NO Exchange on either side — the plan proof
that at scale the join is shuffle-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from printer_etl_hub_spark.sources.bucketing import bucketed, write_bucketed
from printer_etl_hub_spark.tables import load_tables

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    t = load_tables(spark, SF_SMOKE)
    write_bucketed(t["orders"], "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", num_buckets=8,
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    o, li = bucketed_pair
    # disable broadcast so the planner's only choices are SMJ with/without
    # shuffle — the bucketing must remove the Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li, "o_orderkey").groupBy("o_orderstatus").count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no shuffle on the join key — only the final groupBy may exchange
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_correct(spark, bucketed_pair):
    o, li = bucketed_pair
    t = load_tables(spark, SF_SMOKE)
    want = (
        t["orders"].join(
            t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
    )
    assert o.join(li, "o_orderkey").count() == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    o, _ = bucketed_pair
    agg = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
