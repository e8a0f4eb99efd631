#!/usr/bin/env python
"""Round-13 wave-37 scale audit: q292-q299 under the 10x clones.

Events-backed (10x DUPLICATE events — wave-31's clone: every event
replicated with the same users/days/values):
- q292 log-rank: per-user min/max/first-purchase days are duplication-
  invariant, so the subject table — and the ENTIRE row — must be
  BIT-IDENTICAL.
- q293 Cliff's delta: multiplicities x10 scale u2_a and n_a*n_b by
  exactly 100; the quotient is the same real of exact decimal->double
  operands, so delta and the band are BIT-IDENTICAL with n_a/n_b x10.
- q294 Cochran's Q: duplicates land in the same (user, week) block and
  max-flags absorb them — the ENTIRE row bit-identical.
- q295 Ljung-Box: c_i = n*x_i - S scales x10, so every autocovariance
  scales x100 and each rho is the same exact rational — rho, n_pairs,
  and lb_stat BIT-IDENTICAL.
- q296 binned drift: counts x10 with p/q invariant -> tri_term
  INVARIANT and chi2_term x100 (the N*chi2 convention: N scales x10
  AND the Pearson statistic itself scales x10 with both samples), at
  tolerances that absorb the 9dp output rounding (the quantum
  dominates any double-product wiggle).
- q297 Durbin-Watson: x -> 10x scales slope/intercept/residuals x10
  and leaves DW — a ratio of squared-residual sums — invariant; both
  checked at 1e-8 absolute-or-relative (the 9dp rounding quantum x10
  is the binding error, not the arithmetic).
- q299 runs test: 10x_i > 10*med iff x_i > med — signs, runs, and the
  all-integer z inputs are identical, the ENTIRE row bit-identical.

Embeddings-backed (10x clone with shifted ids, identical vectors and
labels — scale_audit.build_clone):
- q298 silhouette: per-label centroids are (10*S)/(10*n) — the same
  real — and each cloned point reproduces its base point's (a, b, s),
  so mean_sil/overall_sil are BIT-IDENTICAL with n_vecs x10.

Usage: python scripts/scale_audit_wave37.py
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

    spark = get_spark("scale-audit-w37")
    out = {"wave": 37, "clone": "10x duplicate events + 10x embeddings",
           "queries": {}}
    ok_all = True

    def run(name, src=None):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(
            2, lambda: fn(spark, src or EV_DST).collect(), spark
        )
        return base, clone, wall, walls

    # q292 — bit-identical
    b, c, wall, walls = run("q292_logrank")
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q292"] = {"wall_s": wall, "walls": walls,
                              "bit_identical": bool(ok)}

    # q293 — delta/magnitude bit-identical, sizes x10
    b, c, wall, walls = run("q293_cliffs_delta")
    bm = {r.event_type: r for r in b}
    ok = len(c) == len(b) and all(
        r.n_a == 10 * bm[r.event_type].n_a
        and r.n_b == 10 * bm[r.event_type].n_b
        and r.delta == bm[r.event_type].delta
        and r.magnitude == bm[r.event_type].magnitude
        for r in c
    )
    ok_all &= ok
    out["queries"]["q293"] = {"wall_s": wall, "walls": walls,
                              "delta_bit_identical_sizes_x10": bool(ok)}

    # q294 — bit-identical
    b, c, wall, walls = run("q294_cochran_q")
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q294"] = {"wall_s": wall, "walls": walls,
                              "bit_identical": bool(ok)}

    # q295 — bit-identical
    b, c, wall, walls = run("q295_ljung_box")
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q295"] = {"wall_s": wall, "walls": walls,
                              "bit_identical": bool(ok)}

    # q296 — tri invariant, chi2 x100, counts x10
    b, c, wall, walls = run("q296_binned_drift")
    bm = {r.bin: r for r in b}
    ok = len(c) == len(b) and all(
        r.n_first == 10 * bm[r.bin].n_first
        and r.n_second == 10 * bm[r.bin].n_second
        and rel(r.tri_term, bm[r.bin].tri_term, 1e-9)
        and rel(r.chi2_term, 100.0 * bm[r.bin].chi2_term, 1e-9)
        and rel(r.tri_total, bm[r.bin].tri_total, 1e-9)
        and rel(r.chi2_total, 100.0 * bm[r.bin].chi2_total, 1e-9)
        for r in c
    )
    ok_all &= ok
    out["queries"]["q296"] = {
        "wall_s": wall, "walls": walls,
        "tri_invariant_chi2_x100_counts_x10": bool(ok),
    }

    # q297 — slope/intercept x10, dw invariant (1e-8: 9dp quantum)
    b, c, wall, walls = run("q297_durbin_watson")
    br, cr = b[0], c[0]
    ok = (
        cr.n_days == br.n_days
        and rel(cr.slope, 10.0 * br.slope, 1e-8)
        and rel(cr.intercept, 10.0 * br.intercept, 1e-8)
        and rel(cr.dw, br.dw, 1e-8)
    )
    ok_all &= ok
    out["queries"]["q297"] = {
        "wall_s": wall, "walls": walls,
        "params_x10_dw_invariant": bool(ok),
    }

    # q299 — bit-identical
    b, c, wall, walls = run("q299_runs_test")
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q299"] = {"wall_s": wall, "walls": walls,
                              "bit_identical": bool(ok)}

    # q298 — embeddings clone: sil bit-identical, n_vecs x10
    b, c, wall, walls = run("q298_silhouette", src=DST)
    bm = {r.label: r for r in b}
    ok = len(c) == len(b) and all(
        r.n_vecs == 10 * bm[r.label].n_vecs
        and r.mean_sil == bm[r.label].mean_sil
        and r.overall_sil == bm[r.label].overall_sil
        for r in c
    )
    ok_all &= ok
    out["queries"]["q298"] = {
        "wall_s": wall, "walls": walls,
        "sil_bit_identical_n_x10": bool(ok),
    }

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
