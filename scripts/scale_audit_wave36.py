#!/usr/bin/env python
"""Round-12 wave-36 scale audit: q290/q291 under the 10x
DUPLICATE-EVENTS clone (events x10, same users/days/arms).

Replication predictions:
- q290 CUPED: per-user (x, y) -> (10x, 10y). cov/var both scale x100
  -> theta is the SAME REAL (checked at 1e-9; the x10 value scale is
  not dyadic so bit-identity is not claimed through the double
  products); rho^2 invariant at 1e-9; adjusted means scale x10
  (rel 1e-9); n_a/n_b IDENTICAL (arms depend only on user ids).
- q291 McNemar: the max-flags are scale-invariant (duplicates of the
  same events change no user's converted status), so the ENTIRE row —
  all four cells and the statistic — must be IDENTICAL.

Usage: python scripts/scale_audit_wave36.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit_wave16 import best_of  # noqa: E402
from scale_audit_wave31 import EV_DST, build_evdup_clone  # noqa: E402
from scale_audit import SRC  # noqa: E402


def main() -> None:
    if not os.path.exists(f"{EV_DST}/events.parquet"):
        build_evdup_clone()
    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w36")
    out = {"wave": 36, "clone": "10x duplicate events", "queries": {}}
    ok_all = True

    fn = REGISTRY["q290_cuped"].fn
    b = fn(spark, SRC).collect()[0]
    wall, walls, c = best_of(2, lambda: fn(spark, EV_DST).collect(), spark)
    c = c[0]
    ok = (
        (c.n_a, c.n_b) == (b.n_a, b.n_b)
        and abs(c.theta - b.theta) < 1e-9
        and abs(c.var_reduction - b.var_reduction) < 1e-9
        and abs(c.mean_adj_a - 10.0 * b.mean_adj_a) <= 1e-8 + 1e-9 * abs(c.mean_adj_a)
        and abs(c.mean_adj_b - 10.0 * b.mean_adj_b) <= 1e-8 + 1e-9 * abs(c.mean_adj_b)
    )
    ok_all &= ok
    out["queries"]["q290"] = {
        "wall_s": wall, "walls": walls,
        "theta_rho2_invariant_means_x10": bool(ok),
    }

    fn = REGISTRY["q291_mcnemar"].fn
    b = fn(spark, SRC).collect()
    wall, walls, c = best_of(2, lambda: fn(spark, EV_DST).collect(), spark)
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q291"] = {
        "wall_s": wall, "walls": walls, "bit_identical": bool(ok)
    }

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
