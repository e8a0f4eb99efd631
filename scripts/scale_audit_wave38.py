#!/usr/bin/env python
"""Round-13 wave-38 scale audit: q300-q305 under the 10x clones.

Events-backed (10x DUPLICATE events):
- q300 ANOVA: exact-decimal group sums scale x10 -> ssb/ssw x10 (rel
  1e-9 through the 9dp rounding); F is NOT scale-invariant (df shift
  by design) so it is checked for CONSISTENCY against a Python
  recompute from the clone's own ssb/ssw/N at 1e-9.
- q302 Cohen's d: means x10, pooled SD x10 -> d and g INVARIANT (rel
  1e-9); arm sizes and df identical.
- q303 CMH: all four cells x10 EXACT per stratum; per-stratum OR
  bit-identical (exact x100/x100 rational); OR_MH invariant (rel
  1e-9); CMH has no clean ratio (the n-1 in V breaks it) so it is
  checked against a from-scratch Python recompute on the clone's
  cells at 1e-9.
- q305 Chow: y-moments scale -> every SSR x100 (rel 1e-9) and F
  INVARIANT (rel 1e-9); day counts identical.

Documents-backed (10x clone, same text, shifted ids):
- q301 curriculum: budget = ceil(10T/4) is not 10*ceil(T/4), so phase
  composition legitimately shifts; the EXACT invariants are Σn_docs
  x10, Σtokens x10, exactly 4 phases, and sorted-contiguity
  (max_toks of phase p <= min_toks of phase p+1).
- q304 Fleiss: every cell count x10 -> P̄/P_e/κ the same exact
  rationals -> BIT-IDENTICAL with counts x10.

Usage: python scripts/scale_audit_wave38.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, SRC, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402
from scale_audit_wave31 import EV_DST, build_evdup_clone  # noqa: E402


def rel(a, b, tol=1e-9):
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

    spark = get_spark("scale-audit-w38")
    out = {"wave": 38, "clone": "10x duplicate events + 10x documents",
           "queries": {}}
    ok_all = True

    def run(name, src=None):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(
            2, lambda: fn(spark, src or EV_DST).collect(), spark
        )
        return base, clone, wall, walls

    # q300 — ssb/ssw x10; F consistent with clone's own components
    b, c, wall, walls = run("q300_anova_f")
    br, cr = b[0], c[0]
    f_expect = (cr.ssb / (cr.k_groups - 1)) / (
        cr.ssw / (cr.n_total - cr.k_groups)
    )
    ok = (
        cr.k_groups == br.k_groups
        and cr.n_total == 10 * br.n_total
        and rel(cr.ssb, 10.0 * br.ssb)
        and rel(cr.ssw, 10.0 * br.ssw)
        and rel(cr.f_stat, f_expect)
    )
    ok_all &= ok
    out["queries"]["q300"] = {"wall_s": wall, "walls": walls,
                              "ss_x10_f_consistent": bool(ok)}

    # q302 — d/g invariant, means x10
    b, c, wall, walls = run("q302_cohens_d")
    br, cr = b[0], c[0]
    ok = (
        (cr.n_a, cr.n_b) == (br.n_a, br.n_b)
        and rel(cr.mean_a, 10.0 * br.mean_a)
        and rel(cr.mean_b, 10.0 * br.mean_b)
        and rel(cr.pooled_sd, 10.0 * br.pooled_sd)
        and rel(cr.d, br.d)
        and rel(cr.g, br.g)
    )
    ok_all &= ok
    out["queries"]["q302"] = {"wall_s": wall, "walls": walls,
                              "d_g_invariant_means_x10": bool(ok)}

    # q303 — cells x10 exact; OR_MH invariant; CMH vs Python recompute
    b, c, wall, walls = run("q303_mantel_haenszel")
    bm = {r.stratum: r for r in b}
    sr = ss = se = sv = 0.0
    sum_a = 0
    for r in c:
        n = r.a + r.b + r.c + r.d
        sum_a += r.a
        sr += r.a * r.d / n
        ss += r.b * r.c / n
        se += (r.a + r.b) * (r.a + r.c) / n
        if n > 1:
            sv += (
                (r.a + r.b) * (r.c + r.d) * (r.a + r.c) * (r.b + r.d)
                / (n * n * (n - 1))
            )
    cmh_expect = (sum_a - se) ** 2 / sv
    ok = len(c) == len(b) and all(
        (r.a, r.b, r.c, r.d)
        == (10 * bm[r.stratum].a, 10 * bm[r.stratum].b,
            10 * bm[r.stratum].c, 10 * bm[r.stratum].d)
        and r.or_stratum == bm[r.stratum].or_stratum
        and rel(r.or_mh, bm[r.stratum].or_mh)
        and rel(r.cmh, cmh_expect)
        for r in c
    )
    ok_all &= ok
    out["queries"]["q303"] = {
        "wall_s": wall, "walls": walls,
        "cells_x10_or_invariant_cmh_consistent": bool(ok),
    }

    # q305 — SSRs x100, F invariant
    b, c, wall, walls = run("q305_chow_test")
    br, cr = b[0], c[0]
    ok = (
        (cr.n_days, cr.n_pre, cr.n_post) == (br.n_days, br.n_pre, br.n_post)
        and rel(cr.ssr_pooled, 100.0 * br.ssr_pooled)
        and rel(cr.ssr_pre, 100.0 * br.ssr_pre)
        and rel(cr.ssr_post, 100.0 * br.ssr_post)
        and rel(cr.f_stat, br.f_stat)
    )
    ok_all &= ok
    out["queries"]["q305"] = {"wall_s": wall, "walls": walls,
                              "ssr_x100_f_invariant": bool(ok)}

    # q301 — documents clone: totals x10, 4 contiguous phases
    b, c, wall, walls = run("q301_curriculum_phases", src=DST)
    c_sorted = sorted(c, key=lambda r: r.phase)
    ok = (
        len(c_sorted) == 4
        and sum(r.n_docs for r in c_sorted) == 10 * sum(r.n_docs for r in b)
        and sum(r.tokens_total for r in c_sorted)
        == 10 * sum(r.tokens_total for r in b)
        and all(
            c_sorted[p].max_toks <= c_sorted[p + 1].min_toks
            for p in range(len(c_sorted) - 1)
        )
    )
    ok_all &= ok
    out["queries"]["q301"] = {
        "wall_s": wall, "walls": walls,
        "totals_x10_phases_contiguous": bool(ok),
    }

    # q304 — documents clone: kappa bit-identical, counts x10
    b, c, wall, walls = run("q304_fleiss_kappa", src=DST)
    br, cr = b[0], c[0]
    ok = (
        cr.n_docs == 10 * br.n_docs
        and (cr.c0, cr.c1, cr.c2) == (10 * br.c0, 10 * br.c1, 10 * br.c2)
        and cr.p_bar == br.p_bar
        and cr.p_e == br.p_e
        and cr.kappa == br.kappa
    )
    ok_all &= ok
    out["queries"]["q304"] = {"wall_s": wall, "walls": walls,
                              "kappa_bit_identical_counts_x10": bool(ok)}

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
