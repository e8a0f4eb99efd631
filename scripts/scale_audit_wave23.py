#!/usr/bin/env python
"""Round-9 wave-23: consolidated single-session 10x regression.

Re-runs every round-9 document/embedding-bound addition on the standard
clone in ONE session — including q254's first-time row — plus the three
legacy anchors (q195/q203/q212) whose deterministic counts must match
their round-7/8 records exactly, proving the round's refactors (q245's
shared _pca_component_frames core, the q241/q244/q246 persists, the
NULL filters in q233/q236, the review-pass NULLIF guards) changed no
audited result.

Expected deterministic counts (from the r7/r8 records + wave 22):
q195 = 253 200 pairs, q203 = 4 767 rows, q212 = 4 767 rows,
q242 = 50 000 rows, q243 = 25 rows (counts exactly 10x sf0.1),
q245 = 64 rows (bit-identical to sf0.1 by replication invariance),
q246 = 20 rows, q248 = 10 rows, q254 = 10 rows.

Usage: python scripts/scale_audit_wave23.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, SRC, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402

EXPECT_ROWS = {
    "q195_containment_pairs": 253_200,
    "q203_component_cohesion": 4_767,
    "q212_graph_triangles": 4_767,
    "q242_lang_propagation": 50_000,
    "q243_cooc_window": 25,
    "q245_pca_power": 64,
    "q246_rank_tau": 20,
    "q248_hybrid_fusion": 10,
    "q254_pca_scores": 10,
}


def main() -> None:
    if not os.path.exists(f"{DST}/documents.parquet"):
        build_clone()
    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w23")
    out: dict = {}
    ok = True
    for name, want in EXPECT_ROWS.items():
        wall, walls, n = best_of(
            2, lambda: REGISTRY[name].fn(spark, DST).count(), spark
        )
        match = n == want
        ok = ok and match
        out[name] = {"wall_s": wall, "attempts": walls, "rows": n,
                     "rows_match_record": match}
        print(json.dumps({name: out[name]}), flush=True)

    # q245 replication invariance (covariance invariant under population
    # replication; DECIMAL sums make the 10x scaling exact)
    b = {(r.dim, r.loading, r.lam) for r in
         REGISTRY["q245_pca_power"].fn(spark, SRC).collect()}
    c = {(r.dim, r.loading, r.lam) for r in
         REGISTRY["q245_pca_power"].fn(spark, DST).collect()}
    out["q245_replication_invariant"] = b == c
    ok = ok and b == c
    out["all_match"] = ok
    print(json.dumps({"wave23": out}, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
