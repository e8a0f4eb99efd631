#!/usr/bin/env python
"""Round-11 wave-30: q272/q273/q275 under the 10x USER-growth clone.

Replication-algebra predictions:
- q272 assoc rules: every support scales exactly x10; confidence
  (10a)/(10b) and lift (10p*10n)/(10a*10b) are the SAME real numbers
  as the base ratios -> correctly-rounded division returns IDENTICAL
  doubles. Counts x10 exact, confidence/lift bit-equal.
- q273 Mann-Kendall: daily x scales x10, so sign(10xj-10xi) =
  sign(xj-xi) and the distinct-count/tie structure of the daily series
  is unchanged -> the ENTIRE row (S, var_num, z, tau_b) must be
  bit-identical to the base run.
- q275 skip-grams: support/occurrences x10 exact, same pattern set.

(q274 reads lineitem, which the users clone leaves untouched - it is
the q01 scan-agg shape class, no clone-sensitive structure.)

Usage: python scripts/scale_audit_wave30.py
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

    spark = get_spark("scale-audit-w30")
    out = {"wave": 30, "clone": "10x users", "queries": {}}
    ok_all = True

    def run(name):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(2, lambda: fn(spark, DST).collect(), spark)
        return base, clone, wall, walls

    base, clone, wall, walls = run("q272_assoc_rules")
    b = {(r.antecedent, r.consequent): r for r in base}
    ok = len(clone) == len(base) and all(
        r.supp_pair == 10 * b[(r.antecedent, r.consequent)].supp_pair
        and r.supp_a == 10 * b[(r.antecedent, r.consequent)].supp_a
        and r.confidence == b[(r.antecedent, r.consequent)].confidence
        and r.lift == b[(r.antecedent, r.consequent)].lift
        for r in clone
    )
    ok_all &= ok
    out["queries"]["q272"] = {
        "wall_s": wall, "walls": walls, "ratios_bit_identical": ok
    }

    base, clone, wall, walls = run("q273_mann_kendall")
    ok = [tuple(r) for r in clone] == [tuple(r) for r in base]
    ok_all &= ok
    out["queries"]["q273"] = {"wall_s": wall, "walls": walls, "bit_identical": ok}

    base, clone, wall, walls = run("q275_skipgram_support")
    b = {(r.gap, r.antecedent, r.consequent): r for r in base}
    ok = len(clone) == len(base) and all(
        r.support == 10 * b[(r.gap, r.antecedent, r.consequent)].support
        and r.occurrences
        == 10 * b[(r.gap, r.antecedent, r.consequent)].occurrences
        for r in clone
    )
    ok_all &= ok
    out["queries"]["q275"] = {"wall_s": wall, "walls": walls, "x10_exact": ok}

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
