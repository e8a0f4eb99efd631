#!/usr/bin/env python
"""Round-12 wave-33 scale audit: q287 under the 10x document clone.

Replication predictions: n_tokens x10 exact for every row; the α = 1
rows' weight/boost are BIT-IDENTICAL ((10n)/(Σ10n) and its boost are
the same reals as base — correctly-rounded division); α = 1/2 and 1/4
are invariant only up to the sqrt rounding (√(10n) is the rounding of
a different real than √10·√n), checked at 1e-9 / 1e-6.

Usage: python scripts/scale_audit_wave33.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, SRC, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402


def main() -> None:
    if not os.path.exists(f"{DST}/documents.parquet"):
        build_clone()
    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w33")
    fn = REGISTRY["q287_temperature_mixture"].fn
    base = fn(spark, SRC).collect()
    wall, walls, clone = best_of(2, lambda: fn(spark, DST).collect(), spark)
    bm = {(r.alpha, r.source): r for r in base}
    ok = len(clone) == len(base)
    for r in clone:
        b = bm[(r.alpha, r.source)]
        ok = ok and r.n_tokens == 10 * b.n_tokens
        if r.alpha == 1.0:
            ok = ok and r.weight == b.weight and r.boost == b.boost
        else:
            ok = ok and abs(r.weight - b.weight) < 1e-9
            ok = ok and abs(r.boost - b.boost) < 1e-6
    print(json.dumps({
        "wave": 33, "clone": "10x documents",
        "q287": {"wall_s": wall, "walls": walls,
                 "alpha1_bit_identical_rest_1e9": bool(ok)},
        "all_invariants_hold": bool(ok),
    }))


if __name__ == "__main__":
    main()
