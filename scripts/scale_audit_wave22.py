#!/usr/bin/env python
"""Round-9 wave-22 scale audit: the round-9 document/embedding-bound
additions at 10x on the standard clone (q242 label propagation, q243
windowed co-occurrence, q245 PCA power iteration, q246 rank tau, q248
hybrid fusion). q241/q244/q247 ride TPC-H/events tables the clone
copies byte-identical (excluded, the q208/q209/q211 precedent).

Built-in exactness checks the clone makes free:
- q243: every document replicates 10x, so each (x, y) pair count must be
  EXACTLY 10x its sf0.1 value with the identical top-25 pair set.
- q245: covariance is invariant under population replication (same
  vector multiset x10: S scales by 10, n by 10, mu unchanged), and the
  DECIMAL sums make the scaling exact — loadings and lambda must be
  BIT-IDENTICAL to the sf0.1 run.

Usage: python scripts/scale_audit_wave22.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, SRC, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402

QUERIES = (
    "q242_lang_propagation",
    "q243_cooc_window",
    "q245_pca_power",
    "q246_rank_tau",
    "q248_hybrid_fusion",
)


def main() -> None:
    if not os.path.exists(f"{DST}/documents.parquet"):
        build_clone()
    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w22")
    out = {}
    for name in QUERIES:
        wall, walls, n = best_of(
            2, lambda: REGISTRY[name].fn(spark, DST).count(), spark
        )
        out[name] = {"wall_s": wall, "attempts": walls, "rows": n}
        print(json.dumps({name: out[name]}), flush=True)

    # exactness check 1: q243 pair counts exactly 10x, identical pair set
    base = {
        (r.x, r.y): (r.n_d1, r.n_d2, r.n_d3, r.n_total)
        for r in REGISTRY["q243_cooc_window"].fn(spark, SRC).collect()
    }
    clone = {
        (r.x, r.y): (r.n_d1, r.n_d2, r.n_d3, r.n_total)
        for r in REGISTRY["q243_cooc_window"].fn(spark, DST).collect()
    }
    ok_pairs = set(base) == set(clone) and all(
        tuple(10 * v for v in base[k]) == clone[k] for k in base
    )
    out["q243_counts_exactly_10x"] = ok_pairs

    # exactness check 2: q245 replication invariance (bit-identical)
    b245 = {(r.dim, r.loading, r.lam) for r in
            REGISTRY["q245_pca_power"].fn(spark, SRC).collect()}
    c245 = {(r.dim, r.loading, r.lam) for r in
            REGISTRY["q245_pca_power"].fn(spark, DST).collect()}
    out["q245_replication_invariant"] = b245 == c245
    print(json.dumps({"wave22": out}, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
