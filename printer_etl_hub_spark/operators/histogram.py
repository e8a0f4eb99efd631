"""Histogram-sketch operators shared by the batch query pack and the
streaming sink.

The equi-width histogram is the sketch family's quantile member (q76
HLL = distinct, q105 CMS = frequency, q90 Bloom = membership): its state
is ``bins`` integer counters, MERGEABLE across partitions, micro-batches,
and days — which is exactly why the streaming twin
(`streaming/corpus.py::hist_quantile_sink`) can maintain it
incrementally. q253 (plans/relational.py) and the sink share the two
functions below, so the stream≡batch equivalence is structural, not
coincidental: same bin assignment, same in-bin interpolation.

Exactness: bin index is integer floor arithmetic off a (lo, hi) range;
the quantile estimate interpolates inside the target bin with ONE
fixed-order double expression (both engines / both paths identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bin_expr(value: Column, lo: Column, hi: Column, bins: int) -> Column:
    """Equi-width bin index in [0, bins): floor((v−lo)/width), clamped
    into the edge bins so out-of-range stream values (the calibration
    range is frozen at deploy time) still land in a counter instead of
    being dropped. A NULL value yields NULL (gated explicitly — Spark's
    greatest/least SKIP NULLs, so without the gate a NULL value would
    silently clamp to bin 0 and be counted; ADVICE r9). A degenerate
    zero-width range (lo == hi, where nullif makes the division NULL)
    clamps every non-NULL value to bin 0 — with one distinct point the
    single-bin histogram is the correct sketch."""
    width = (hi - lo) / F.lit(float(bins))
    raw = F.floor((value - lo) / F.nullif(width, F.lit(0.0))).cast("int")
    clamped = F.least(F.lit(bins - 1), F.greatest(F.lit(0), F.coalesce(raw, F.lit(0))))
    return F.when(value.isNotNull(), clamped)


def hist_quantile_table(
    hist: DataFrame, rng: DataFrame, bins: int, ps: tuple[float, ...]
) -> DataFrame:
    """(bin, c) histogram + 1-row (lo, hi, n) range → (p, est): the
    interpolated quantile estimates. The cumulative window runs over the
    ≤ ``bins``-row histogram — bounded by construction, never data-sized.
    Target rank is the type-1 position ⌈p·n⌉ (the q236/q253 integer-rank
    discipline); the estimate places it fractionally inside its bin."""
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bin",
        "c",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).cast("bigint").alias("below"),
    )
    ps_col = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    targets = (
        cum.join(F.broadcast(rng))
        .select(ps_col, "bin", "c", "below", "lo", "hi", "n")
        .filter(
            (F.col("below") < F.ceil(F.col("p") * F.col("n")))
            & (F.col("below") + F.col("c") >= F.ceil(F.col("p") * F.col("n")))
        )
    )
    est = (
        F.col("lo")
        + (F.col("hi") - F.col("lo"))
        / F.lit(float(bins))
        * (
            F.col("bin").cast("double")
            + (
                F.ceil(F.col("p") * F.col("n")).cast("double")
                - F.col("below").cast("double")
            )
            / F.col("c").cast("double")
        )
    )
    return targets.select("p", F.round(est, 6).alias("est"))


def hist_quantile_table_grouped(
    hist: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    ps: tuple[float, ...],
    key_cols: list[str],
) -> DataFrame:
    """Per-group twin of `hist_quantile_table`: ``hist`` holds
    (*key_cols, bin, c) — e.g. the per-event-time-window counters the
    watermarked stream emits — and each group gets its own (p, est, n)
    rows via the SAME fixed-order interpolation expression, so grouped
    results stay cell-identical to the global path on a single group.
    The cumulative window partitions by the keys and orders over ≤
    ``bins`` rows per group — bounded by construction. The (lo, hi)
    range is shared across groups (frozen at deploy time, the sink
    convention); a group's n is its own counter sum."""
    wcum = (
        Window.partitionBy(*key_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(*key_cols)
    cum = hist.select(
        *key_cols,
        "bin",
        "c",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).cast("bigint").alias("below"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    ps_col = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    targets = cum.select(
        *key_cols,
        ps_col,
        "bin",
        "c",
        "below",
        F.lit(float(lo)).alias("lo"),
        F.lit(float(hi)).alias("hi"),
        "n",
    ).filter(
        (F.col("below") < F.ceil(F.col("p") * F.col("n")))
        & (F.col("below") + F.col("c") >= F.ceil(F.col("p") * F.col("n")))
    )
    est = (
        F.col("lo")
        + (F.col("hi") - F.col("lo"))
        / F.lit(float(bins))
        * (
            F.col("bin").cast("double")
            + (
                F.ceil(F.col("p") * F.col("n")).cast("double")
                - F.col("below").cast("double")
            )
            / F.col("c").cast("double")
        )
    )
    return targets.select(*key_cols, "p", F.round(est, 6).alias("est"), "n")
