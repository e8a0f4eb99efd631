"""Markov removal-effect attribution core shared by the batch query and
the streaming sink.

`attribution_table` solves the absorbing chain for a TRANSITION-COUNT
frame — q263 (plans/relational.py) builds those counts in one pass over
events, `streaming/corpus.py::attribution_sink` accumulates them
incrementally from a journey-state store — so the stream≡batch
equivalence is structural: identical probabilities, identical 16 pinned
absorption rounds (DECIMAL(38,18) product sums, the q251 discipline),
identical removal semantics (a deleted channel's in-edges leak to lost,
never renormalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Pinned absorption-iteration count (see q263's exactness contract).
ATTR_ROUNDS = 16
ATTR_START = "__start__"
ATTR_CONV = "__conv__"
ATTR_NONE = "__none__"
ATTR_LOST = "__lost__"


def attribution_table(trans: DataFrame) -> DataFrame:
    """(prev, nxt, n) pooled journey-transition counts → (channel,
    p_base, p_removed, removal_effect, attribution), one row per
    channel — the QUERY-path wrapper: pins release through
    `plans/common.py::materialize_release`'s deferred ledger, which is
    query-at-a-time and thread-scoped. Streaming sinks (foreachBatch
    runs on a streaming thread) must use `attribution_frames` and
    release the pins themselves after writing."""
    from ..plans.common import materialize_release

    res, pins = attribution_frames(trans)
    return materialize_release(res, *pins)


def attribution_frames(trans: DataFrame):
    """The chain solve: returns (result_frame, pins) where ``pins`` are
    the persisted shared subtrees the lazy result still references —
    the caller decides the release discipline. ``prev``/``nxt`` use the
    sentinel states ATTR_START / ATTR_CONV / ATTR_LOST; channels are
    every non-sentinel state.

    All frames downstream of ``trans`` are ≤ (|channels|+1)·|states|²
    rows; the 16 rounds run with per-round localCheckpoint (lineage on
    a 16-deep lazily-nested join chain explodes Catalyst planning —
    measured on q263)."""
    from pyspark import StorageLevel

    spark = trans.sparkSession
    tot = trans.groupBy("prev").agg(F.sum("n").cast("bigint").alias("tot"))
    p = trans.join(F.broadcast(tot), "prev").select(
        "prev",
        "nxt",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
    )
    channels = (
        trans.select(F.col("prev").alias("ch"))
        .unionByName(trans.select(F.col("nxt").alias("ch")))
        .filter(~F.col("ch").isin(ATTR_START, ATTR_CONV, ATTR_LOST))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    chains = channels.select(F.col("ch").alias("chain")).unionByName(
        spark.range(1).select(F.lit(ATTR_NONE).alias("chain"))
    )
    states = channels.select(F.col("ch").alias("state")).unionByName(
        spark.range(1).select(F.lit(ATTR_START).alias("state"))
    )
    r = p.filter(F.col("nxt") == ATTR_CONV).select(
        F.col("prev").alias("state"), F.col("p").alias("r")
    )
    rbase = (
        chains.join(states)
        .filter(F.col("state") != F.col("chain"))
        .join(r, "state", "left")
        .select("chain", "state", F.coalesce("r", F.lit(0.0)).alias("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    q_ch = (
        p.join(states.withColumnRenamed("state", "nxt"), "nxt")
        .join(chains)
        .filter((F.col("prev") != F.col("chain")) & (F.col("nxt") != F.col("chain")))
        .select("chain", "prev", "nxt", "p")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dec18 = "decimal(38,18)"
    a = rbase.select("chain", "state", F.col("r").alias("a"))
    for _ in range(ATTR_ROUNDS):
        contrib = (
            q_ch.join(
                a.select(F.col("chain"), F.col("state").alias("nxt"), F.col("a")),
                ["chain", "nxt"],
            )
            .groupBy("chain", F.col("prev").alias("state"))
            .agg(
                F.sum((F.col("p") * F.col("a")).cast(dec18))
                .cast("double")
                .alias("c")
            )
        )
        a = (
            rbase.join(contrib, ["chain", "state"], "left")
            .select(
                "chain",
                "state",
                (F.col("r") + F.coalesce(F.col("c"), F.lit(0.0))).alias("a"),
            )
            .localCheckpoint(eager=True)
        )
    astart = a.filter(F.col("state") == ATTR_START).select("chain", "a")
    p_base = astart.filter(F.col("chain") == ATTR_NONE).select(
        F.col("a").alias("p_base")
    )
    per_ch = (
        astart.filter(F.col("chain") != ATTR_NONE)
        .join(F.broadcast(p_base))
        .select(
            F.col("chain").alias("channel"),
            "p_base",
            F.col("a").alias("p_removed"),
            ((F.col("p_base") - F.col("a")) / F.nullif("p_base", F.lit(0.0))).alias(
                "re"
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    re_tot = per_ch.agg(
        F.sum(F.col("re").cast(dec18)).cast("double").alias("re_tot")
    )
    res = (
        per_ch.join(F.broadcast(re_tot))
        .select(
            "channel",
            F.round("p_base", 9).alias("p_base"),
            F.round("p_removed", 9).alias("p_removed"),
            F.round("re", 9).alias("removal_effect"),
            F.round(F.col("re") / F.nullif("re_tot", F.lit(0.0)), 9).alias(
                "attribution"
            ),
        )
        .orderBy("channel")
    )
    return res, (channels, rbase, q_ch, per_ch)
