#!/usr/bin/env python
"""Round-13 wave-39 scale audit: q306-q309 under the 10x clones.

Events-backed (10x DUPLICATE events):
- q306 decomposition: x -> 10x scales trend/seasonal/remainder x10;
  checked at 1e-5 absolute-or-relative (the 6dp output rounding x10
  is the binding error, not the arithmetic). Day strings and x x10
  exact.
- q307 scorecard: the dyadic recursions are linear in x, so every
  residual scales ~x10 (exact up to double x10 rounding) -> MAE/RMSE
  x10 and MASE invariant at 1e-6; n identical per model.

Documents-backed (10x clone, same text/lang, shifted ids):
- q308 AUC: multiplicities x10 scale u2 and n1*n0 by exactly 100 ->
  auc/gini BIT-IDENTICAL with counts x10 (the q293 argument).
- q309 Brier: every bin cell x10 -> mean_p/frac_en/brier the same
  exact rationals -> BIT-IDENTICAL with n x10.

Usage: python scripts/scale_audit_wave39.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, SRC, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402
from scale_audit_wave31 import EV_DST, build_evdup_clone  # noqa: E402


def rel(a, b, tol):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def main() -> None:
    if not os.path.exists(f"{EV_DST}/events.parquet"):
        build_evdup_clone()
    if not os.path.exists(f"{DST}/documents.parquet"):
        build_clone()

    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w39")
    out = {"wave": 39, "clone": "10x duplicate events + 10x documents",
           "queries": {}}
    ok_all = True

    def run(name, src=None):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(
            2, lambda: fn(spark, src or EV_DST).collect(), spark
        )
        return base, clone, wall, walls

    # q306 — components x10 at 1e-5 (6dp rounding x10)
    b, c, wall, walls = run("q306_classical_decomposition")
    bm = {r.day: r for r in b}

    def x10(a, base):
        if a is None and base is None:
            return True
        if a is None or base is None:
            return False
        return rel(a, 10.0 * base, 1e-5)

    ok = len(c) == len(b) and all(
        r.x == 10 * bm[r.day].x
        and x10(r.trend, bm[r.day].trend)
        and x10(r.seasonal, bm[r.day].seasonal)
        and x10(r.remainder, bm[r.day].remainder)
        for r in c
    )
    ok_all &= ok
    out["queries"]["q306"] = {"wall_s": wall, "walls": walls,
                              "components_x10": bool(ok)}

    # q307 — MAE/RMSE x10, MASE invariant, n identical
    b, c, wall, walls = run("q307_forecast_scorecard")
    bm = {r.model: r for r in b}
    ok = len(c) == len(b) and all(
        r.n == bm[r.model].n
        and rel(r.mae, 10.0 * bm[r.model].mae, 1e-6)
        and rel(r.rmse, 10.0 * bm[r.model].rmse, 1e-6)
        and rel(r.mase, bm[r.model].mase, 1e-6)
        for r in c
    )
    ok_all &= ok
    out["queries"]["q307"] = {"wall_s": wall, "walls": walls,
                              "metrics_x10_mase_invariant": bool(ok)}

    # q308 — documents clone: auc/gini bit-identical, counts x10
    b, c, wall, walls = run("q308_score_auc", src=DST)
    br, cr = b[0], c[0]
    ok = (
        cr.n_en == 10 * br.n_en
        and cr.n_other == 10 * br.n_other
        and cr.auc == br.auc
        and cr.gini == br.gini
    )
    ok_all &= ok
    out["queries"]["q308"] = {"wall_s": wall, "walls": walls,
                              "auc_bit_identical_counts_x10": bool(ok)}

    # q309 — documents clone: bins bit-identical, n x10
    b, c, wall, walls = run("q309_brier_calibration", src=DST)
    bm = {r.bin: r for r in b}
    ok = len(c) == len(b) and all(
        r.n == 10 * bm[r.bin].n
        and r.mean_p == bm[r.bin].mean_p
        and r.frac_en == bm[r.bin].frac_en
        and r.brier == bm[r.bin].brier
        for r in c
    )
    ok_all &= ok
    out["queries"]["q309"] = {"wall_s": wall, "walls": walls,
                              "bins_bit_identical_n_x10": bool(ok)}

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
