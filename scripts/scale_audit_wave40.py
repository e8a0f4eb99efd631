#!/usr/bin/env python
"""Round-13 wave-40 scale audit: q310-q313 under the 10x clones.

Events-backed (10x DUPLICATE events):
- q310 Friedman/W: x -> 10x is monotone within every week, so every
  within-week rank is IDENTICAL -> the ENTIRE row bit-identical.
- q311 negbin: m and s^2 scale (x10, x100) -> r_hat x10... no:
  r = m^2/(s^2 - m): 100m^2/(100s^2 - 10m) has no clean ratio (the -m
  breaks it), so r_hat/p_hat/dispersion are checked against a Python
  recompute from the clone's own mean/var at 1e-9; mean x10 and var
  x100 at 1e-9.
- q312 Grubbs: the integer score |n*x - S| scales x10 -> same argmax
  day; G = |x - m|/s is scale-INVARIANT -> day/n identical, x10 on
  x_outlier, g_stat equal at 1e-9.

Documents-backed (10x clone, shifted ids):
- q313 KS: the clone's ids hash to NEW u values (ids are shifted), so
  no replication identity exists for D; the audit instead recomputes
  D from scratch in Python over the clone's ids and pins the engine
  against it at 1e-9 (the consistency-on-the-clone discipline q300's
  F uses), plus n x10.

Usage: python scripts/scale_audit_wave40.py
"""

from __future__ import annotations

import hashlib
import json
import math
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

    spark = get_spark("scale-audit-w40")
    out = {"wave": 40, "clone": "10x duplicate events + 10x documents",
           "queries": {}}
    ok_all = True

    def run(name, src=None):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(
            2, lambda: fn(spark, src or EV_DST).collect(), spark
        )
        return base, clone, wall, walls

    # q310 — bit-identical (monotone x10 preserves within-week ranks)
    b, c, wall, walls = run("q310_friedman_kendall_w")
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q310"] = {"wall_s": wall, "walls": walls,
                              "bit_identical": bool(ok)}

    # q311 — mean x10, var x100; fit consistent with clone moments
    b, c, wall, walls = run("q311_negbin_fit")
    br, cr = b[0], c[0]
    m, var = cr.mean_x, cr.var_x
    ok = (
        cr.n_days == br.n_days
        and rel(cr.mean_x, 10.0 * br.mean_x)
        and rel(cr.var_x, 100.0 * br.var_x, 1e-8)
        and rel(cr.r_hat, m * m / (var - m), 1e-6)
        and rel(cr.p_hat, m / var)
        and rel(cr.dispersion, (cr.n_days - 1) * var / m, 1e-6)
    )
    ok_all &= ok
    out["queries"]["q311"] = {"wall_s": wall, "walls": walls,
                              "moments_scale_fit_consistent": bool(ok)}

    # q312 — same day, x10 value, G invariant
    b, c, wall, walls = run("q312_grubbs_outlier")
    br, cr = b[0], c[0]
    ok = (
        cr.n_days == br.n_days
        and cr.outlier_day == br.outlier_day
        and cr.x_outlier == 10 * br.x_outlier
        and rel(cr.g_stat, br.g_stat)
    )
    ok_all &= ok
    out["queries"]["q312"] = {"wall_s": wall, "walls": walls,
                              "day_identical_g_invariant": bool(ok)}

    # q313 — documents clone: recompute D from scratch over clone ids
    import duckdb

    ids = [r[0] for r in duckdb.connect().execute(
        f"SELECT doc_id FROM '{DST}/documents.parquet'"
    ).fetchall()]
    us = sorted(
        (int(hashlib.md5(f"{i}:sample".encode()).hexdigest()[:15], 16)
         % 1_000_000) / 1_000_000.0
        for i in ids
    )
    n = len(us)
    d_ref = max(max((i + 1) / n - u, u - i / n) for i, u in enumerate(us))
    b, c, wall, walls = run("q313_hash_uniformity_ks", src=DST)
    br, cr = b[0], c[0]
    ok = (
        cr.n == 10 * br.n
        and rel(cr.d_stat, d_ref)
        and rel(cr.sqrt_n_d, d_ref * math.sqrt(n), 1e-6)
    )
    ok_all &= ok
    out["queries"]["q313"] = {"wall_s": wall, "walls": walls,
                              "d_matches_scratch_recompute_n_x10": bool(ok)}

    out["all_invariants_hold"] = bool(ok_all)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
