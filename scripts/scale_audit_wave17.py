#!/usr/bin/env python
"""Round-8 wave-17 scale audit: the round-8 document-bound additions at
10x (q222 zipf curve, q223 effective vocab, q225 reliability bins,
q227 degree assortativity, q232 stratified split). The standard 10x
clone multiplies token mass, digest-group sizes, and the near-dup
clique fan-out; q224/q226/q228-q231/q233/q234 ride tables the clone
copies byte-identical (excluded, the q208/q209/q211 precedent).

Usage: python scripts/scale_audit_wave17.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402

QUERIES = (
    "q222_zipf_curve",
    "q223_effective_vocab",
    "q225_reliability_bins",
    "q227_degree_assortativity",
    "q232_stratified_split",
)


def main() -> None:
    if not os.path.exists(f"{DST}/documents.parquet"):
        build_clone()
    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w17")
    out = {}
    for name in QUERIES:
        wall, walls, n = best_of(
            2, lambda: REGISTRY[name].fn(spark, DST).count(), spark
        )
        out[name] = {"wall_s": wall, "attempts": walls, "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"wave17": out}, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
