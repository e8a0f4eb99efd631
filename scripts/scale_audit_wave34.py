#!/usr/bin/env python
"""Round-12 wave-34 scale audit: q288 under the 10x document clone
(embeddings replicate 10x — identical vectors, shifted ids).

Replication prediction: a replicated multiset's type-1 pick at rank
ceil(p*10n) is the BASE element at ceil(ceil(p*10n)/10) = ceil(p*n)
(nested-ceiling identity), so every quantile pick — and with it med,
q1, q3, iqr — must be BIT-IDENTICAL to base, with n_vecs x10 exact.
A rank-arithmetic slip (floor for ceil, 0- vs 1-based) breaks bit
equality at some dim.

Usage: python scripts/scale_audit_wave34.py
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

    spark = get_spark("scale-audit-w34")
    fn = REGISTRY["q288_dim_robust_scaling"].fn
    base = fn(spark, SRC).collect()
    wall, walls, clone = best_of(2, lambda: fn(spark, DST).collect(), spark)
    bm = {r.dim: r for r in base}
    ok = len(clone) == len(base) and all(
        r.n_vecs == 10 * bm[r.dim].n_vecs
        and r.q1 == bm[r.dim].q1
        and r.med == bm[r.dim].med
        and r.q3 == bm[r.dim].q3
        and r.iqr == bm[r.dim].iqr
        for r in clone
    )
    print(json.dumps({
        "wave": 34, "clone": "10x embeddings",
        "q288": {"wall_s": wall, "walls": walls,
                 "n_x10_picks_bit_identical": bool(ok)},
        "all_invariants_hold": bool(ok),
    }))


if __name__ == "__main__":
    main()
