#!/usr/bin/env python
"""Round-11 wave-29: the six new queries (q266-q271) under the 10x
USER-growth clone (wave-21's events clone: 10 copies, shifted
user_id/event_id, identical ts/type/value per copy; documents are
untouched, so q267 audits on the standard 10x documents clone's base
instead — its shape is a pure per-row pass + |sources| agg, already
the q99 class).

Built-in exactness predictions (replication algebra, not tolerance):
- q266: every value's pooled count scales c=10, so doubled midranks
  obey w2' = 10(w2-1)+1 and the U statistic scales EXACTLY x100
  (u2' = 100*u2, integer-for-integer). n_a/n_b scale x10.
- q268: var_num' = 100*var_num exactly (D fixed, Sx2 x100, (Sx)^2
  x100); n_events x10.
- q269: every pattern's support and occurrences scale exactly x10
  (journeys replicate per user; no cross-user pattern exists).
- q270: d/c/n_risk scale x10 and every survival factor
  (10n-10d)/(10n) is the SAME real number as (n-d)/n -> correctly
  rounded division returns the IDENTICAL double: survival must be
  bit-equal to the base run.
- q271: with dyadic coefficients on integer counts every state value
  at this span is an exact dyadic double (<= ~45 significand bits),
  so the whole fold is exactly linear: level/trend/season/forecast
  scale x10 (compared at the 6dp rounding, tolerance 1e-6).

Usage: python scripts/scale_audit_wave29.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit_wave16 import best_of  # noqa: E402
from scale_audit_wave21 import DST, build_users_clone  # noqa: E402
from scale_audit import SRC  # noqa: E402


def main() -> None:
    if not os.path.exists(f"{DST}/events.parquet"):
        build_users_clone()
    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w29")
    out = {"wave": 29, "clone": "10x users", "queries": {}}
    ok_all = True

    def run(name):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(2, lambda: fn(spark, DST).collect(), spark)
        return base, clone, wall, walls

    # q266: u2 scales x100, n x10
    base, clone, wall, walls = run("q266_mannwhitney_u")
    b = {r.event_type: r for r in base}
    ok = len(clone) == len(base) and all(
        r.n_a == 10 * b[r.event_type].n_a
        and int(r.u2_a) == 100 * int(b[r.event_type].u2_a)
        and int(r.u2_b) == 100 * int(b[r.event_type].u2_b)
        for r in clone
    )
    ok_all &= ok
    out["queries"]["q266"] = {"wall_s": wall, "walls": walls, "u2_x100_exact": ok}

    # q268: var_num x100 exact, n_events x10
    base, clone, wall, walls = run("q268_burstiness")
    b = {r.event_type: r for r in base}
    ok = len(clone) == len(base) and all(
        r.n_events == 10 * b[r.event_type].n_events
        and int(r.var_num) == 100 * int(b[r.event_type].var_num)
        for r in clone
    )
    ok_all &= ok
    out["queries"]["q268"] = {"wall_s": wall, "walls": walls, "var_x100_exact": ok}

    # q269: support/occurrences x10 exact, same pattern set
    base, clone, wall, walls = run("q269_seq_patterns")
    b = {(r.n, r.pattern): r for r in base}
    ok = len(clone) == len(base) and all(
        (r.n, r.pattern) in b
        and r.support == 10 * b[(r.n, r.pattern)].support
        and r.occurrences == 10 * b[(r.n, r.pattern)].occurrences
        for r in clone
    )
    ok_all &= ok
    out["queries"]["q269"] = {"wall_s": wall, "walls": walls, "x10_exact": ok}

    # q270: counts x10, survival bit-identical
    base, clone, wall, walls = run("q270_kaplan_meier")
    b = {r.t_days: r for r in base}
    ok = len(clone) == len(base) and all(
        r.n_risk == 10 * b[r.t_days].n_risk
        and r.d_converted == 10 * b[r.t_days].d_converted
        and r.c_censored == 10 * b[r.t_days].c_censored
        and r.survival == b[r.t_days].survival  # bit-equal, not approx
        for r in clone
    )
    ok_all &= ok
    out["queries"]["q270"] = {
        "wall_s": wall, "walls": walls, "survival_bit_identical": ok
    }

    # q271: linear fold -> x10 at the 6dp rounding
    base, clone, wall, walls = run("q271_holt_winters")
    b = {r.day: r for r in base}
    ok = len(clone) == len(base) and all(
        r.x == 10 * b[r.day].x
        and abs(r.forecast - 10 * b[r.day].forecast) <= 1e-5
        and abs(r.level - 10 * b[r.day].level) <= 1e-5
        for r in clone
    )
    ok_all &= ok
    out["queries"]["q271"] = {"wall_s": wall, "walls": walls, "x10_linear": ok}

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
