"""Salted equi-join for skewed keys.

AQE's skew-join split (enabled in session.py, exercised in
tests/test_partitioning.py) handles most skew at runtime, but it only
splits SORT-MERGE join partitions — a skewed key feeding an aggregation
above the join, or a join AQE planned differently, can still hot-spot one
task. The classic manual rewrite: replicate the small side across N salt
buckets and scatter the big side uniformly among them, turning one hot
partition into N even ones.

Result correctness is independent of the salt values (every big-side row
meets the full small-side row set for its key exactly once), so the salt
can be anything uniform; we derive it from a hash of the whole big-side row
(deterministic under task retries, no RNG).

Cost model: replication multiplies the small side ×N — use ONLY when the
small side is modest (but too big / not broadcastable) and a key is hot
enough that one reducer dominates the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with N-way salt scatter.

    Supported ``how``: inner / left (the replicated-right shapes).
    Output columns = big's columns + small's non-key columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumnRenamed(key, "_skey")
    out = b.join(
        s, (F.col(key) == F.col("_skey")) & (b["_salt"] == s["_salt"]), how
    )
    return out.drop("_salt").drop("_skey")
