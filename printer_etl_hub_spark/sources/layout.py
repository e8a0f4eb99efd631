"""Multi-dimensional data layout (Z-order clustering) for scan pruning.

Parquet scans prune at file/row-group granularity using column min/max
stats. A sort by one column makes stats selective for THAT column only;
interleaving the bits of several rank-normalized columns (Morton / Z-order
— the same layout Delta's OPTIMIZE ZORDER BY produces) makes every
clustered column's min/max range narrow in every file, so predicates on ANY
of them skip most of the data.

Scale path: quantile boundaries come from ``approxQuantile`` (distributed
Greenwald-Khanna sketch, driver gets only the cut points), bucketing and
bit-interleave are narrow codegen'd expressions, and the only shuffle is the
final ``repartitionByRange`` on the Z key — exactly one pass over the data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_by_boundaries(col: Column, boundaries: list[float]) -> Column:
    """Quantile-bucket index = #boundaries strictly below the value.
    O(len(boundaries)) vectorized array ops per row, no shuffle."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: col > b))


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Morton code: bit i of column k lands at position i*len(cols)+k."""
    k = len(bucket_cols)
    parts = []
    for ci, c in enumerate(bucket_cols):
        c = c.cast("long")
        for bit in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(c, bit).bitwiseAND(F.lit(1)), bit * k + ci)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key(
    df: DataFrame, cols: list[str], *, bits: int = 8, rel_err: float = 0.01
) -> Column:
    """Z-order key column over ``cols`` (numeric/date-castable)."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    casted = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    all_bounds = casted.approxQuantile(cols, probs, rel_err)
    for c, bounds in zip(cols, all_bounds):
        # dedup: heavy hitters / low-cardinality columns repeat boundaries;
        # keep strictly increasing
        uniq = sorted(set(bounds))
        idx = _bucket_by_boundaries(F.col(c).cast("double"), uniq)
        # MSB-align: scale the index to the full [0, 2^bits) range so a
        # low-cardinality column's top bit still lands at the top of the
        # interleave (otherwise the range split ignores it entirely)
        scale = float(n_buckets) / (len(uniq) + 1)
        buckets.append(F.floor(idx.cast("double") * F.lit(scale)).cast("long"))
    return _interleave(buckets, bits)


def write_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet Z-clustered on ``cols``: range-partition by
    the Z key (one shuffle), sort within partitions, drop the key."""
    z = zorder_key(df, cols, bits=bits)
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
