#!/usr/bin/env python
"""Round-10 wave-28: q263 Markov attribution under a 10x USER-growth
clone (wave-21's events clone: 10 copies, shifted user_id/event_id,
identical ts/type/value per copy).

Built-in exactness check — attribution is REPLICATION-INVARIANT, bit
for bit: every journey appears 10x, so every transition count and every
row total scale exactly 10x, and (10n)/(10tot) is the SAME real number
as n/tot — IEEE correctly-rounded division of exact integers returns
the identical double, so P, the 16 absorption rounds, and the final
attribution shares must all come out IDENTICAL to the base run (not
approximately: equal as collected values). A plan that double-counts
transitions, leaks journeys across the clone boundary, or lets
aggregation order into the probabilities breaks exact equality.

Usage: python scripts/scale_audit_wave28.py
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

    spark = get_spark("scale-audit-w28")
    fn = REGISTRY["q263_markov_attribution"].fn

    base = [tuple(r) for r in fn(spark, SRC).collect()]
    wall, walls, clone = best_of(
        2, lambda: [tuple(r) for r in fn(spark, DST).collect()], spark
    )
    ident = clone == base

    print(
        json.dumps(
            {
                "wave": 28,
                "q263": {
                    "wall_10x": wall,
                    "attempts": walls,
                    "rows": len(clone),
                    "base_rows": base,
                    "bitwise_replication_invariant": ident,
                },
                "all_match": bool(ident and len(clone) > 0),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
