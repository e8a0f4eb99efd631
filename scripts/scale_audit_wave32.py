#!/usr/bin/env python
"""Round-12 wave-32 scale audit: q285/q286 under the 10x document clone
(scale_audit.build_clone — embeddings replicate 10x with shifted ids,
identical vectors and labels).

Replication predictions:
- q286 Davies-Bouldin: per-label centroids are (10·Σx)/(10·n) — the
  SAME REAL as Σx/n, so correctly-rounded division returns identical
  doubles; per-point distance multisets replicate, so each scatter
  S_i = (10·Σdist)/(10·n_i) is again the same real; pair distances and
  D_i derive from identical inputs → the ENTIRE per-label row
  (scatter, d_i, db_index) must be BIT-IDENTICAL with n_vecs x10.
- q285 Calinski-Harabasz: WSS terms replicate exactly (DECIMAL sums →
  x10 EXACT); BSS terms scale by the non-dyadic 10 through a double
  multiply (n_l·(mu−mu_g)² with mu bit-identical), so BSS is checked
  at relative 1e-12 against 10x; CH is NOT replication-invariant (its
  df shift is by design), so it is checked against the same
  from-scratch numpy reference as tests/test_wave31_refs.py, run ON
  THE CLONE, to relative 1e-6.

Usage: python scripts/scale_audit_wave32.py
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

    spark = get_spark("scale-audit-w32")
    out = {"wave": 32, "clone": "10x documents/embeddings", "queries": {}}
    ok_all = True

    def run(name):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(2, lambda: fn(spark, DST).collect(), spark)
        return base, clone, wall, walls

    b, c, wall, walls = run("q286_davies_bouldin")
    bm = {r.label: r for r in b}
    ok = len(c) == len(b) and all(
        r.n_vecs == 10 * bm[r.label].n_vecs
        and r.scatter == bm[r.label].scatter
        and r.d_i == bm[r.label].d_i
        and r.db_index == bm[r.label].db_index
        for r in c
    )
    ok_all &= ok
    out["queries"]["q286"] = {
        "wall_s": wall, "walls": walls, "n_x10_rest_bit_identical": bool(ok)
    }

    b, c, wall, walls = run("q285_calinski_harabasz")
    b, c = b[0], c[0]
    import duckdb
    import numpy as np

    rows = duckdb.connect().execute(
        f"SELECT label, embedding FROM '{DST}/embeddings.parquet' "
        "WHERE label IS NOT NULL AND embedding IS NOT NULL"
    ).fetchall()
    labels = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows], dtype=np.float64)
    mu_g = x.mean(axis=0)
    uniq = sorted(set(labels.tolist()))
    bss_ref = sum(
        (labels == l).sum() * float(((x[labels == l].mean(axis=0) - mu_g) ** 2).sum())
        for l in uniq
    )
    wss_ref = sum(
        float(((x[labels == l] - x[labels == l].mean(axis=0)) ** 2).sum())
        for l in uniq
    )
    n, k = len(rows), len(uniq)
    ch_ref = (bss_ref / (k - 1)) / (wss_ref / (n - k))
    ok = (
        c.n_vecs == 10 * b.n_vecs
        and c.k_labels == b.k_labels
        and abs(c.wss - 10.0 * b.wss) <= 1e-9 * abs(c.wss)
        # both sides are ROUNDED to 9dp before the x10 comparison, so
        # the bound is 10 x the half-quantum (5e-10) + the true fp gap
        and abs(c.bss - 10.0 * b.bss) <= 1e-12 * abs(c.bss) + 6e-9
        and abs(c.ch - ch_ref) <= 1e-6 * abs(ch_ref)
    )
    ok_all &= ok
    out["queries"]["q285"] = {
        "wall_s": wall, "walls": walls,
        "wss_x10_exact_ch_matches_clone_ref": bool(ok),
    }

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

