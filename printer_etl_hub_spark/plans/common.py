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
    RETURNED frame still references: eagerly localCheckpoint the (narrow)
    result — one materialization, while the pin is alive — then release
    the pinned input(s). Library callers composing these plans outside
    the gate/bench harnesses (which clearCache at entry) would otherwise
    accumulate session-lifetime catalog caches; checkpoint RDD blocks by
    contrast are freed by the ContextCleaner once the result is
    unreferenced. (Same idiom as operators/dedup.py::semantic_dedup.)
    """
    # Stash the PRE-checkpoint physical plan (cache substitution still
    # active) for the plan-hygiene tests: the returned frame's own plan
    # collapses to the checkpoint scan, which would blind the
    # BNLJ/cache-reuse tripwires for exactly these queries. Gated behind
    # CAPTURE_PLANS (test-only): production calls skip the plan
    # stringification entirely — it forces physical planning eagerly and
    # mutates a module global, neither of which belongs on the hot path.
    global LAST_MATERIALIZED_PLAN
    if CAPTURE_PLANS:
        LAST_MATERIALIZED_PLAN = out._jdf.queryExecution().executedPlan().toString()
    out = out.localCheckpoint(eager=True)
    for p in pinned:
        p.unpersist(blocking=False)
    return out


#: Test-only switch: the plan-hygiene suite flips this on so
#: materialize_release captures the pre-checkpoint physical plan.
#: Default False — production callers pay nothing for the introspection.
CAPTURE_PLANS: bool = False

#: Physical plan (string) of the most recent materialize_release call,
#: captured before the checkpoint collapsed it (only when CAPTURE_PLANS).
LAST_MATERIALIZED_PLAN: str | None = None
