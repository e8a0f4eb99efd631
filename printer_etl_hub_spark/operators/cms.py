"""Count-Min sketch: fixed-memory heavy-hitter estimation.

The third sketch in the engine's mergeable family (HLL distinct rollup →
q76, Bloom membership → q90, CMS frequency → q105). A CMS is a d×w
counter grid; item x increments one counter per row i at column
h_i(x), and its estimate is the MIN over rows — an overestimate whose
error is bounded by (e/w)·N with probability 1 − e^-d.

Why it matters at 100 TB: exact token frequencies need vocab-sized
state (the `q51` explode→groupBy shuffle grows with the corpus), while
the CMS is a CONSTANT d·w cells regardless of corpus or vocabulary
size, and it's a sum — map-side combinable, partition-mergeable,
streaming-friendly (the same property the q76 HLL partials and the q90
bitmap exploit). Heavy-hitter candidates then probe the broadcast grid.

Portability: hashes are md5-derived (``h_i(x) = int(md5(i ':' x)[:8],
16) mod w``) like every other cross-engine hash in this repo, so a SQL
oracle reproduces the grid cell-for-cell — estimates are EXACT
reproducible numbers, not merely within-bound.

Reference: Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications", J. Algorithms 55 (2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_col(item: Column, i: Column, width: int) -> Column:
    """Row-``i`` column index for ``item`` — the md5 family shared with
    the oracle SQL."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(i.cast("string"), F.lit(":"), item)), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def cms_build(
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d×w counter grid over an item column (one row per
    occurrence). One explode(d) + one groupBy on (i, col) — shuffle
    width is d·w groups, independent of corpus size. Returns
    (i, col, c).

    ``weight_col``: when the caller already holds PRE-AGGREGATED counts
    (one row per distinct item + a count column), pass that column and
    each item increments its cells by the weight — the resulting grid is
    cell-for-cell identical to building from the raw occurrence stream,
    but the explode fans out over the vocabulary instead of the corpus."""
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1)
    return (
        items.select(F.col(col).alias("_item"), w.alias("_w"))
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
        .select("i", _cms_col(F.col("_item"), F.col("i"), width).alias("col"), "_w")
        .groupBy("i", "col")
        .agg(F.sum("_w").cast("bigint").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each candidate's count: min over the d probed cells.
    The sketch broadcasts (d·w rows); candidates fan out d-fold then
    collapse with a map-side-combinable min. Missing cells count 0
    (an item whose cell nobody touched has estimate 0). Returns the
    candidate columns plus ``est_cnt``."""
    probes = (
        candidates.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
        .withColumn("col", _cms_col(F.col(col), F.col("i"), width))
        .join(F.broadcast(sketch), ["i", "col"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0).cast("bigint")))
    )
    return probes.groupBy(*candidates.columns).agg(F.min("c").alias("est_cnt"))
