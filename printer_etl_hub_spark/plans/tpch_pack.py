"""TPC-H completion pack — the remaining TPC-H query shapes (Q2, Q6-Q9,
Q11-Q13, Q15, Q16, Q19-Q22) over the driver corpus.

With q01/q34/q35/q40/q42/q44/q45/q54 in ``relational.py`` this registers all
22 TPC-H shapes. The corpus (TESTDATA.md) has no ``partsupp`` table and no
``l_shipmode``/``l_commitdate``/``l_receiptdate``/``c_phone`` columns, so
Q2/Q9/Q11/Q12/Q16/Q20/Q21/Q22 are *adapted*: identical plan shape (the part
Catalyst must optimize — correlated subqueries, exists/not-exists, scalar
thresholds, disjunctive pushdown), substituting available columns for the
missing ones. Each docstring states the substitution.

Scale notes (100 TB): every dim join broadcasts; every agg is partial-
aggregable map-side; fact-fact joins shuffle on their keys with AQE skew
handling; self-joins (Q21 shape) reuse one shuffle of lineitem by orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_tables
from .common import dsum, materialize_release, sql_dsum

_TS = "timestamp"


def _ts(s: str) -> F.Column:
    return F.lit(s).cast(_TS)


# --------------------------------------------------------------------------
# q57 — TPC-H Q6: forecasting revenue change (pure filter + scan agg)
# --------------------------------------------------------------------------
def q57_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates push into the parquet scan (PushedFilters);
    the agg is a single map-side-combinable global sum — the minimal
    one-stage, zero-shuffle TPC-H query."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


Q57_SQL = f"""
SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q58 — TPC-H Q7: volume shipping between two nations
# --------------------------------------------------------------------------
def q58_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast copies of nation (supplier side / customer side) with a
    symmetric pair predicate; the only shuffles are the lineitem⋈orders and
    ⋈customer fact joins."""
    t = load_tables(spark, sf_dir)
    n_supp = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


Q58_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
"""


# --------------------------------------------------------------------------
# q59 — TPC-H Q8: national market share
# --------------------------------------------------------------------------
def q59_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-share aggregation: both numerator and denominator are
    decimal-exact sums cast to double before the division, so the ratio is
    bit-identical across engines and partition orders."""
    t = load_tables(spark, sf_dir)
    n_supp = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    n_cust = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= _ts("1995-01-01"))
                & (F.col("o_orderdate") < _ts("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(t["region"]), F.col("c_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))).alias(
                "nation_volume"
            ),
            dsum(volume).alias("total_volume"),
        )
        .withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))
    )


Q59_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {sql_dsum("CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS nation_volume,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_volume,
       {sql_dsum("CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         / {sql_dsum("l_extendedprice * (1 - l_discount)")} AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY CAST(year(o_orderdate) AS INT)
"""


# --------------------------------------------------------------------------
# q60 — TPC-H Q9 (adapted): product-type profit by nation and year
# --------------------------------------------------------------------------
def q60_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape without ``partsupp``: supply cost substituted with
    ``0.05 * p_retailprice * l_quantity`` (a per-unit cost from the part
    dim). Plan shape is identical — fact scan, LIKE-filtered broadcast part
    join, supplier→nation broadcast chain, orders join for the year."""
    t = load_tables(spark, sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.05) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
    )


Q60_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {sql_dsum("l_extendedprice * (1 - l_discount) - 0.05 * p_retailprice * l_quantity")} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
"""


# --------------------------------------------------------------------------
# q61 — TPC-H Q13 (adapted): customer order-count distribution
# --------------------------------------------------------------------------
def q61_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double aggregation over a filtered LEFT OUTER join (customers with
    zero orders must survive as c_count=0). The o_comment NOT LIKE filter is
    substituted with an o_orderpriority exclusion — same filtered-outer-join
    shape Catalyst must not push below the join's null-producing side."""
    t = load_tables(spark, sf_dir)
    filtered = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(filtered, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q61_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# q62 — TPC-H Q15: top supplier by period revenue
# --------------------------------------------------------------------------
def q62_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue view is computed ONCE (persisted — it is one row per
    supplier, tiny at any scale) and reused for both the per-supplier rows
    and the global max (broadcast single-row join instead of a re-evaluated
    scalar subquery, which would re-scan the fact table); equality on the
    max is exact because both sides are the same
    decimal-sum-cast-to-double values."""
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    res = (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
    return materialize_release(res, rev)


Q62_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# q63 — TPC-H Q19 (adapted): disjunctive predicate pushdown (OR-of-ANDs)
# --------------------------------------------------------------------------
def q63_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three AND-brackets OR'd together across both join sides. Catalyst
    CNF-converts and pushes the common join key + per-side residuals; the
    p_container/l_shipmode legs are substituted with p_size brackets (the
    corpus has no container/shipmode columns)."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    bracket1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    )
    bracket2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    )
    bracket3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(bracket1 | bracket2 | bracket3).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


Q63_SQL = f"""
SELECT {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# q64 — TPC-H Q21 (adapted): suppliers who kept orders waiting
# --------------------------------------------------------------------------
def q64_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exists + not-exists double correlation on a lineitem self-join.
    The corpus has no receipt/commit dates, so "late" is substituted with
    ``l_returnflag = 'R'``: suppliers whose returned line was on a
    multi-supplier finished order where no OTHER supplier's line was
    returned. Both correlations are equi-joins on l_orderkey with a suppkey
    inequality residual — left_semi + left_anti, sharing one shuffle of
    lineitem by orderkey (no nested loop)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .drop("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey"))
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_5")
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q64_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F' AND n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --------------------------------------------------------------------------
# q65 — TPC-H Q22 (adapted): global sales opportunity
# --------------------------------------------------------------------------
def q65_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar average threshold + anti join. The phone country code is
    substituted with c_mktsegment (the corpus has no c_phone). The average
    is sum(decimal)/count — the exact same float both engines derive — so
    the boundary filter is engine-stable; the no-orders predicate is a
    left_anti join (NOT EXISTS). Every sf0.01 customer has SOME order, so
    "no orders" is scoped to the recent window (lapsed customers) to stay
    non-degenerate — same anti-join shape."""
    t = load_tables(spark, sf_dir)
    thr = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("_avg_bal"))
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= _ts("2000-01-01"))
    return (
        t["customer"]
        .join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


Q65_SQL = f"""
SELECT c_mktsegment AS cntrycode, count(*) AS numcust,
       {sql_dsum("c_acctbal")} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {sql_dsum("c_acctbal")} / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q66 — TPC-H Q2 (adapted): minimum-cost supplier per part
# --------------------------------------------------------------------------
def q66_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated groupwise-min without ``partsupp``: the offer table is
    derived from lineitem (min observed unit price per part/supplier pair).
    The correlated min subquery decorrelates to a per-part window min over
    the SAME eligible frame — one pass, one shuffle by part key, instead of
    the aggregate-plus-join-back diamond that would scan and aggregate
    lineitem twice."""
    t = load_tables(spark, sf_dir)
    offers = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eligible = (
        offers.join(
            F.broadcast(
                t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("_min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q66_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM offers
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND unit_cost = (SELECT min(o2.unit_cost)
                   FROM offers o2
                   JOIN supplier s2 ON o2.l_suppkey = s2.s_suppkey
                   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                   JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                   WHERE o2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q67 — TPC-H Q11 (adapted): important inventory share
# --------------------------------------------------------------------------
def q67_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's HAVING-over-global-scalar without ``partsupp``: part value is
    the revenue shipped by NATION_7 suppliers. The fact table is scanned and
    aggregated ONCE: the per-part frame keeps exact decimal partials
    (persisted — one row per part), and the global total re-aggregates those
    partials (decimal addition is associative, so the total is bit-identical
    to the oracle's direct sum over base rows); threshold arithmetic is the
    identical float expression on both engines. The 0.001 fraction is
    sf0.01-calibrated; TPC-H's own Q11 scales it by 1/SF (at 10x the share
    of every part drops below a fixed fraction — expected, not a bug)."""
    from pyspark import StorageLevel

    t = load_tables(spark, sf_dir)
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_7")
    )
    grouped = (
        j.groupBy("l_partkey")
        .agg(F.sum(value.cast("decimal(25,6)")).alias("_pv_dec"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = grouped.agg(F.sum("_pv_dec").cast("double").alias("_total_value"))
    res = (
        grouped.withColumn("part_value", F.col("_pv_dec").cast("double"))
        .join(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("_total_value"))
        .select("l_partkey", "part_value")
    )
    return materialize_release(res, grouped)


Q67_SQL = f"""
SELECT l_partkey, {sql_dsum("l_extendedprice * (1 - l_discount)")} AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
GROUP BY l_partkey
HAVING {sql_dsum("l_extendedprice * (1 - l_discount)")} >
  0.001 * (SELECT {sql_dsum("l_extendedprice * (1 - l_discount)")}
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_7')
"""


# --------------------------------------------------------------------------
# q68 — TPC-H Q16 (adapted): supplier diversity per part attribute
# --------------------------------------------------------------------------
def q68_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per part attribute triple with a NOT-IN supplier
    exclusion. The "complaints" comment scan is substituted with
    ``s_acctbal < 0`` (no s_comment column); NOT IN over a non-null key is
    a left_anti join. The distinct-count shuffles once on the group keys
    with partial distinct aggregation map-side."""
    t = load_tables(spark, sf_dir)
    sizes = [1, 4, 9, 14, 19, 24, 28, 35, 42, 49]
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(sizes)
    )
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    j = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q68_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 35, 42, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# q69 — TPC-H Q20 (adapted): suppliers with excess shipments
# --------------------------------------------------------------------------
def q69_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested semi-join chain without ``partsupp``: a supplier
    qualifies if some red part it shipped in 1996 exceeded 50 units total.
    The aggregated subquery is a grouped sum joined to the part filter, then
    collapsed to a distinct supplier set driving a left_semi join — no
    correlated re-execution."""
    t = load_tables(spark, sf_dir)
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity")).alias("qty_sum"))
    )
    qualifying = (
        shipped.join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(F.col("qty_sum") > 50.0)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


Q69_SQL = f"""
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING {sql_dsum("l_quantity")} > 50.0
  )
"""


# --------------------------------------------------------------------------
# q70 — TPC-H Q12 (adapted): shipping-class priority counts
# --------------------------------------------------------------------------
def q70_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's CASE-count aggregation with l_returnflag standing in for the
    missing l_shipmode: per class, how many high- vs low-priority orders
    shipped in the window. One fact-fact join, map-side partial CASE sums."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


Q70_SQL = """
SELECT l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


TPCH_PACK_QUERIES = {
    "q57_tpch_q6": (q57_tpch_q6, Q57_SQL),
    "q58_tpch_q7": (q58_tpch_q7, Q58_SQL),
    "q59_tpch_q8": (q59_tpch_q8, Q59_SQL),
    "q60_tpch_q9": (q60_tpch_q9, Q60_SQL),
    "q61_tpch_q13": (q61_tpch_q13, Q61_SQL),
    "q62_tpch_q15": (q62_tpch_q15, Q62_SQL),
    "q63_tpch_q19": (q63_tpch_q19, Q63_SQL),
    "q64_tpch_q21": (q64_tpch_q21, Q64_SQL),
    "q65_tpch_q22": (q65_tpch_q22, Q65_SQL),
    "q66_tpch_q2": (q66_tpch_q2, Q66_SQL),
    "q67_tpch_q11": (q67_tpch_q11, Q67_SQL),
    "q68_tpch_q16": (q68_tpch_q16, Q68_SQL),
    "q69_tpch_q20": (q69_tpch_q20, Q69_SQL),
    "q70_tpch_q12": (q70_tpch_q12, Q70_SQL),
}
