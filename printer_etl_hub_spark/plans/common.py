"""Cross-engine determinism helpers.

Float aggregation order differs between Spark (partial aggs, partition order)
and DuckDB — a raw SUM(double) diverges in the low bits and breaks the
oracle's value-hash. Every oracle-compared double aggregation therefore sums
EXACT decimals and casts the result back to double:

    Spark:  F.sum(expr.cast("decimal(25,6)")).cast("double")
    DuckDB: CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS DOUBLE)

Per-row double arithmetic is IEEE-identical across engines, so row-level
expressions stay plain doubles. This costs ~nothing at scale (decimal adds
are still partial-aggregable map-side) and buys bit-exact reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column) -> Column:
    """Order-insensitive exact sum of a double expression, as double."""
    return F.sum(col.cast(DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def ts_str(col: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Render a timestamp as a string (UTC session) — engine-portable output."""
    return F.date_format(col, fmt)


def md5_sample_gate(col: Column, frac: float, salt: str = "sample") -> Column:
    """Deterministic membership gate keeping ~``frac`` of distinct values:
    md5(value:salt) mod 1e6 < frac·1e6. The sampling knob the recall
    harnesses (q114/q126/q138) use so their EXACT ground-truth side
    prices at sample size, not corpus size, at 100x — deterministic (no
    RNG, so reruns and oracles see the same sample) and value-keyed (the
    same id samples in or out regardless of partitioning)."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f":{salt}"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(1_000_000)) < F.lit(int(round(frac * 1_000_000)))


def materialize_release(out, *pinned):
    """Cache-hygiene idiom for a plan that persists a shared subtree its
    RETURNED frame still references: DEFER the release. The pins stay
    registered until the NEXT materialize_release call (or an explicit
    :func:`flush_pending_release`), so the caller's first action on
    ``out`` still reads the cache — the persist materializes once, inside
    that action — and nothing outlives one query in a session that keeps
    calling queries. The gate/bench harnesses additionally clearCache at
    query entry, which makes the later unpersist a no-op.

    Why not materialize eagerly here (the round-6 mechanism)? Measured at
    sf0.1 best-of-3: an eager ``localCheckpoint`` OR ``persist+count`` of
    the result costs 2-4.5x wall-clock on node-/doc-cardinality outputs
    (q132 0.79s lazy vs 3.5s eager; q90 1.19 vs 2.8; q124 0.54 vs 1.0)
    because it materializes EVERY output column in an extra pass, while
    the caller's own action usually prunes columns / aggregates. The
    deferred form keeps the r5 wall-clock exactly and still bounds cache
    lifetime to one query.
    """
    # Stash the physical plan (cache substitution visible as
    # InMemoryRelation/InMemoryTableScan nodes) for the plan-hygiene
    # tests. Gated behind CAPTURE_PLANS (test-only): production calls
    # skip the stringification — it forces physical planning eagerly and
    # mutates a module global, neither of which belongs on the hot path.
    global LAST_MATERIALIZED_PLAN
    if CAPTURE_PLANS:
        LAST_MATERIALIZED_PLAN = out._jdf.queryExecution().executedPlan().toString()
    flush_pending_release()
    _PENDING_RELEASE.extend(pinned)
    return out


def flush_pending_release() -> None:
    """Unpersist every pin deferred by :func:`materialize_release`.
    Harness entry points call this (or ``clearCache``) between queries;
    unpersisting an already-cleared frame is a no-op."""
    while _PENDING_RELEASE:
        _PENDING_RELEASE.pop().unpersist(blocking=False)


#: Pins whose release is deferred until the next materialize_release
#: call / explicit flush — at most one query's pins at any time.
_PENDING_RELEASE: list = []


#: Test-only switch: the plan-hygiene suite flips this on so
#: materialize_release captures the pre-checkpoint physical plan.
#: Default False — production callers pay nothing for the introspection.
CAPTURE_PLANS: bool = False

#: Physical plan (string) of the most recent materialize_release call,
#: captured before the checkpoint collapsed it (only when CAPTURE_PLANS).
LAST_MATERIALIZED_PLAN: str | None = None


def dist_rank(df, order_cols, out: str = "rank", n_parts: int = 32):
    """Global 1-based total-order rank WITHOUT a single-partition window
    (q77/q95's distributed shape): repartitionByRange on the sort key →
    per-partition row_number (range partitions are globally ordered) →
    broadcast partition-offset table. ``order_cols`` must be a total
    order (append a unique id). Returns ``(ranked_frame, pinned)`` — the
    pinned frame feeds both the rank and the offsets, so the CALLER must
    release it (pass through :func:`materialize_release`). At 100 TB,
    raise ``n_parts`` with the data; nothing else changes.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    parted = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    lw = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    local = parted.withColumn("_lrn", F.row_number().over(lw))
    sizes = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    ow = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_pid", F.coalesce(F.sum("_cnt").over(ow), F.lit(0)).alias("_off")
    )
    ranked = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )
    return ranked, parted
