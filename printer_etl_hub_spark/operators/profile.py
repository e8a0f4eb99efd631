"""Dataset profiling: per-column statistics in one pass.

The profile every ingest pipeline runs before trusting a new dataset:
row/null/distinct counts and numeric moments per column, emitted in LONG
format (col_name, stat, value) so downstream rules are data-driven.

Scale: ONE aggregation over the table computes every stat (no per-column
scans); moments use exact decimal partials (sum, sum-of-squares) so the
derived mean/stddev are bit-identical across engines and partition orders —
a naive float stddev differs in the low bits run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def profile_columns(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """Long-format profile ``(col_name, stat, value)`` for numeric columns.

    Stats: n (non-null count), n_distinct, min, max, mean, stddev (sample).
    All values as double; mean/stddev derived from exact decimal partials:
    var = (sumsq - sum²/n) / (n-1).
    """
    aggs = []
    for c in numeric_cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.countDistinct(col).alias(f"{c}__n_distinct"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.sum(col.cast(DEC)).alias(f"{c}__sum"),
            F.sum((col.cast(DEC) * col.cast(DEC))).alias(f"{c}__sumsq"),
        ]
    wide = df.agg(*aggs)
    # single explode over the one-row agg frame — NOT a union of per-stat
    # selects (which would reference the aggregate N×6 times)
    entries = []
    for c in numeric_cols:
        n = F.col(f"{c}__n").cast("double")
        s = F.col(f"{c}__sum").cast("double")
        sq = F.col(f"{c}__sumsq").cast("double")
        mean = s / n
        var = (sq - (s * s) / n) / (n - 1)
        # mean/stddev round to 9 decimals: the decimal partials are exact,
        # but engines convert decimal→double differently (DuckDB divides the
        # scaled int by 10^scale, Spark rounds the decimal directly), which
        # can leave the derived stats 1 ulp apart. 9 digits is far inside
        # the statistic's meaning and far outside the ulp noise.
        stats = {
            "n": F.col(f"{c}__n").cast("double"),
            "n_distinct": F.col(f"{c}__n_distinct").cast("double"),
            "min": F.col(f"{c}__min"),
            "max": F.col(f"{c}__max"),
            "mean": F.round(mean, 9),
            "stddev": F.round(F.sqrt(var), 9),
        }
        for stat, expr in stats.items():
            entries.append(
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.lit(stat).alias("stat"),
                    expr.alias("value"),
                )
            )
    return wide.select(F.explode(F.array(*entries)).alias("kv")).select("kv.*")


def hot_keys(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-``k`` most frequent values of a key column with counts and
    corpus share — the pre-flight skew diagnosis that decides whether a
    join/agg on this key needs `operators/skewjoin.py::salted_join` or
    the q36 salted two-stage agg. One map-side-combinable groupBy, a
    1-row total broadcast, a bounded top-k: cost is one shuffle of the
    distinct keys regardless of corpus size.

    Returns (key, cnt, share) ordered by (cnt DESC, key) — a share
    above ~1/shuffle-partitions on a single key is the smoking gun.
    """
    counts = (
        df.select(F.col(col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(k)
    )


def partition_histogram(df: DataFrame) -> DataFrame:
    """Rows per physical partition — detects a skewed layout (one fat
    partition = one straggler task) BEFORE an expensive stage runs on
    it. Diagnostic-only: the numbers depend on the current partitioning,
    not on the data semantics (so no oracle; pin with unit tests).

    Returns (partition_id, n_rows) ordered by partition_id.
    """
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .orderBy("partition_id")
    )
