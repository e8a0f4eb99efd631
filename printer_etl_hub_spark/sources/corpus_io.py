"""Corpus materialization: hive-partitioned parquet for cleaned corpora.

The last step of corpus preparation (q81) is writing the survivors out in
a layout downstream training jobs can prune: hive-style directories on a
low-cardinality column (language, source, quality decile), so a mixture
job reading one language touches one directory instead of scanning the
corpus. Complements `sources/bucketing.py` (join-key co-location) and
`sources/layout.py` (multi-dimensional Z-order clustering) as the third
layout primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: Formats this container's Spark ships with. Avro needs the external
#: spark-avro jar (absent here) — listed so the error is explicit.
SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("pred_lang",),
    files_per_partition: int = 1,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a hive-partitioned corpus under ``path``.

    ``fmt`` picks the storage format: parquet (default — the scale
    path: columnar, predicate/column pushdown), orc (same class, for
    ORC-standardized lakes), json/csv (interchange with non-Spark
    tooling; no pushdown — document readers pay full scans).

    Without the pre-shuffle, every upstream task writes a sliver into
    every partition directory — thousands of tiny files at scale (the
    classic small-files problem). Repartitioning on the partition columns
    first sends each partition value to exactly one task → one
    well-sized file per directory; ``files_per_partition > 1`` adds a
    hash salt so hot partitions (one language dominating the corpus)
    split across that many files/tasks instead of bottlenecking on one.
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(
            f"unsupported corpus format {fmt!r}; supported: {SUPPORTED_FORMATS} "
            "(avro requires the external spark-avro package)"
        )
    cols = [F.col(c) for c in partition_by]
    if files_per_partition > 1:
        # Row-level salt: spreads each partition value over up to
        # files_per_partition shuffle targets (file-split only — the salt
        # never lands in the data).
        salt = F.monotonically_increasing_id() % files_per_partition
        staged = df.withColumn("_salt", salt).repartition(*cols, F.col("_salt")).drop(
            "_salt"
        )
    else:
        staged = df.repartition(*cols)
    w = staged.write.mode("overwrite").partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a corpus written by :func:`write_corpus`. Filters on the
    partition columns prune directories at planning time (visible as
    ``PartitionFilters`` in the scan's explain output) for every format;
    row-group/stripe pushdown additionally applies to parquet/orc."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(
            f"unsupported corpus format {fmt!r}; supported: {SUPPORTED_FORMATS}"
        )
    r = spark.read
    if fmt == "csv":
        r = r.option("header", "true").option("inferSchema", "true")
    return r.format(fmt).load(path)
