#!/usr/bin/env python
"""Round-12 wave-35 scale audit: q289 under the 10x DUPLICATE-EVENTS
clone (wave-31's EV_DST: events x10, same users/days — every daily
count scales x10).

Replication prediction: x -> 10x is MONOTONE, so every sign
comparison, every histogram prefix, every V_t and U_t is IDENTICAL —
the ENTIRE output row (n_days included: days don't replicate) must be
BIT-IDENTICAL to base. Any dependence on magnitudes rather than order
breaks it.

Usage: python scripts/scale_audit_wave35.py
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

    spark = get_spark("scale-audit-w35")
    fn = REGISTRY["q289_pettitt"].fn
    base = fn(spark, SRC).collect()
    wall, walls, clone = best_of(2, lambda: fn(spark, EV_DST).collect(), spark)
    ok = [tuple(r) for r in clone] == [tuple(r) for r in base]
    print(json.dumps({
        "wave": 35, "clone": "10x duplicate events",
        "q289": {"wall_s": wall, "walls": walls, "bit_identical": bool(ok)},
        "all_invariants_hold": bool(ok),
    }))


if __name__ == "__main__":
    main()
