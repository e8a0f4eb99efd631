#!/usr/bin/env python
"""Round-8 wave-16 scale audit: q217 / q219 / q220 at 10× (VERDICT r7 #5).

Three different stress shapes, one session:

* q219_neardup_survivorship — the composed quality-keeper election
  (q135's pair+CC+window subtree + source rollup) on the standard 10×
  document clone: every doc becomes a 10-way near-dup clique, the worst
  case for the pair generator AND the keeper window.
* q220_head_share — dist_rank over the exploded token counts on the
  clone (token mass ×10, vocab unchanged): confirms the rank path stays
  a range-repartition + per-partition row_number, never a
  single-partition window over |vocab|.
* q217_pit_feature_join — the clone copies events/customer
  byte-identical, so the REAL 10× stress is versions-per-key: the
  interval-residual join's intermediate is |events| × V before the
  residual filter keeps exactly one version per event. We price the
  production posture (V ≤ 2) against an adversarial V=50 SCD2 history
  built inline, on the SAME events table, and record the fan-out.

q216/q218/q221 are events-table aggs the clone copies byte-identical —
excluded, no stress added (the q208/q209/q211 precedent).

Usage: python scripts/scale_audit_wave16.py
Output: one JSON line per measurement + a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, build_clone  # noqa: E402  (sibling script)


def best_of(k, fn, spark):
    walls, rows = [], None
    for _ in range(k):
        spark.catalog.clearCache()
        from printer_etl_hub_spark.plans.common import flush_pending_release

        flush_pending_release()
        t0 = time.perf_counter()
        rows = fn()
        walls.append(round(time.perf_counter() - t0, 2))
    return min(walls), walls, rows


def main() -> None:
    if not os.path.exists(f"{DST}/documents.parquet"):
        build_clone()

    from pyspark.sql import functions as F

    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark
    from printer_etl_hub_spark.tables import load_tables

    spark = get_spark("scale-audit-w16")
    out = {}

    for name in ("q219_neardup_survivorship", "q220_head_share"):
        wall, walls, n = best_of(
            2, lambda: REGISTRY[name].fn(spark, DST).count(), spark
        )
        out[name] = {"wall_s": wall, "attempts": walls, "rows": n}
        print(json.dumps({name: out[name]}), flush=True)

    # q217: production posture on the clone (identical events), then the
    # adversarial V=50 SCD2 history. Fan-out = join rows BEFORE the
    # interval residual filter; kept = rows after (must equal |events|).
    t = load_tables(spark, DST)
    ev = t["events"].select(
        F.col("user_id").alias("c_custkey"),
        F.col("ts").cast("date").alias("d"),
        "value",
    )
    n_events = ev.count()

    wall, walls, n = best_of(
        2, lambda: REGISTRY["q217_pit_feature_join"].fn(spark, DST).count(), spark
    )
    out["q217_production_V<=2"] = {"wall_s": wall, "attempts": walls, "rows": n}
    print(json.dumps({"q217_production": out["q217_production_V<=2"]}), flush=True)

    # Adversarial V=50: each key gets 50 half-open monthly-ish slices
    # covering the event range; exactly one matches any event date.
    V = 50
    keys = t["customer"].select("c_custkey")
    vers = (
        keys.crossJoin(spark.range(V).select(F.col("id").alias("i")))
        .select(
            "c_custkey",
            F.date_add(F.lit("2023-06-01").cast("date"), (F.col("i") * 7).cast("int")).alias(
                "eff_from"
            ),
            F.when(
                F.col("i") < V - 1,
                F.date_add(
                    F.lit("2023-06-01").cast("date"), ((F.col("i") + 1) * 7).cast("int")
                ),
            )
            .otherwise(F.lit("9999-12-31").cast("date"))
            .alias("eff_to"),
            F.concat(F.lit("seg_"), (F.col("i") % 7).cast("string")).alias("segment"),
        )
    )

    def run_v50():
        j = ev.join(F.broadcast(vers), "c_custkey")
        fanout = j.count()
        kept = j.filter(
            (F.col("eff_from") <= F.col("d")) & (F.col("d") < F.col("eff_to"))
        )
        res = kept.groupBy("segment").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,18)")).alias("v"),
        )
        return fanout, kept.count(), res.count()

    t0 = time.perf_counter()
    fanout, kept, segs = run_v50()
    w1 = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    run_v50()
    w2 = round(time.perf_counter() - t0, 2)
    out["q217_adversarial_V50"] = {
        "wall_s": min(w1, w2),
        "attempts": [w1, w2],
        "n_events": n_events,
        "join_fanout_rows": fanout,
        "rows_after_residual": kept,
        "segments": segs,
    }
    print(json.dumps({"q217_adversarial_V50": out["q217_adversarial_V50"]}), flush=True)

    print(json.dumps({"wave16": out}, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
