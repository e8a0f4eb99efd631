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


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("pred_lang",),
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as hive-partitioned parquet under ``path``.

    Without the pre-shuffle, every upstream task writes a sliver into
    every partition directory — thousands of tiny files at scale (the
    classic small-files problem). Repartitioning on the partition columns
    first sends each partition value to exactly one task → one
    well-sized file per directory; ``files_per_partition > 1`` adds a
    hash salt so hot partitions (one language dominating the corpus)
    split across that many files/tasks instead of bottlenecking on one.
    """
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
    staged.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a corpus written by :func:`write_corpus`. Filters on the
    partition columns prune directories at planning time (visible as
    ``PartitionFilters`` in the scan's explain output)."""
    return spark.read.parquet(path)
