"""Bucketed tables: pre-shuffled storage for co-located joins/aggs.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Bucketing
pays that shuffle ONCE at write time: both tables hash-partitioned into the
same number of buckets on the join key mean a sort-merge join with NO
Exchange on either side (asserted by test_plans-style checks) — every
subsequent join/groupBy on the key is shuffle-free.

The reference has no storage layer to bucket (a single JSON document); this
is the engine's scale path for its canonical store and any fact table a
user registers. Works with Spark's native (non-Hive) catalog.

Rules of thumb encoded here:
- bucket count is a power of two sized so one bucket ≈ 100-200 MB
  post-compression (fits an executor core's working set);
- bucket on the highest-fan-out equi-join key (orderkey, custkey, doc_id);
- sortBy the same key so the merge side of SMJ streams without re-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucketing metadata comes from the
    catalog, so joins on the bucket column skip their Exchange)."""
    return spark.table(table)
