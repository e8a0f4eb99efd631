#!/usr/bin/env python
"""Round-12 wave-31 scale audit: q279-q284 at 10x.

Two clones, each chosen so the statistic has a CLOSED-FORM replication
prediction (exact algebra, not tolerances, wherever the arithmetic
allows):

1. DUPLICATE-EVENTS clone (events replicated 10x with the SAME user
   ids, shifted event_ids — per-user counts scale x10, user set / day
   set / arm assignment unchanged):
   - q279 Welch: n_a/n_b IDENTICAL, var_num x100 EXACT integers
     (n·Σ(10x)² − (Σ10x)² = 100·(nΣx²−(Σx)²)); t/df agree to 1e-9/1e-3
     (the x10 value scale is not dyadic, so bit-identity is not claimed
     across the double divisions — the integer audit columns carry the
     exactness).
   - q280 Spearman: x → 10x is MONOTONE, so every midrank — and with it
     every sufficient statistic and rho — is BIT-IDENTICAL.
   - q282 Wilcoxon: diffs scale x10, |d| ranks and signs unchanged →
     the ENTIRE row (w2_plus, tie_t, z) bit-identical; n_pairs same.

2. DOCUMENT clone (scale_audit.build_clone — documents x10, same
   text/lang/source):
   - q281 Cramér's V: every cell/margin x10 → χ² x10 and V INVARIANT
     (χ²/(N·min) sees x10/x10); checked at 1e-9 on V, relative 1e-9 on
     χ² (the d² doubles round differently at x100 magnitude).
   - q283 Brown-Forsythe: medians invariant under replication; F is NOT
     invariant (df shift by design) — checked against the same
     from-scratch Python reference as tests/test_wave31_refs.py, run ON
     THE CLONE, to 1e-9.
   - q284 kappa: N·diag and S both scale x100 exactly → kappa is the
     SAME REAL NUMBER and one correctly-rounded division must return
     the BIT-IDENTICAL double; margins x10/x100 exact.

Usage: python scripts/scale_audit_wave31.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST as DOC_DST  # noqa: E402
from scale_audit import SRC, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402

EV_DST = os.environ.get("SCALE_EVDUP_DIR", "/dev/shm/peh_scale10x_evdup")
COPIES = 10
EV_OFFSET = 10_000_000


def build_evdup_clone() -> None:
    """sf0.1 → EV_DST: every table byte-identical EXCEPT events, which
    replicates 10x with the SAME user ids and shifted event_ids."""
    import duckdb

    os.makedirs(EV_DST, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{EV_DST}/{t}.parquet")
    duckdb.connect().execute(
        f"""
        COPY (
          SELECT e.event_id + c.i * {EV_OFFSET} AS event_id, e.ts,
                 e.user_id, e.event_type, e.value, e.props
          FROM '{SRC}/events.parquet' e,
               (SELECT unnest(range({COPIES})) AS i) c
          ORDER BY event_id
        ) TO '{EV_DST}/events.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    if not os.path.exists(f"{EV_DST}/events.parquet"):
        build_evdup_clone()
    if not os.path.exists(f"{DOC_DST}/documents.parquet"):
        build_clone()

    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w31")
    out = {"wave": 31, "queries": {}}
    ok_all = True

    def run(name, dst):
        fn = REGISTRY[name].fn
        base = fn(spark, SRC).collect()
        wall, walls, clone = best_of(2, lambda: fn(spark, dst).collect(), spark)
        return base, clone, wall, walls

    # --- duplicate-events clone ------------------------------------
    b, c, wall, walls = run("q279_welch_t", EV_DST)
    b, c = b[0], c[0]
    ok = (
        (c.n_a, c.n_b) == (b.n_a, b.n_b)
        and int(c.var_num_a) == 100 * int(b.var_num_a)
        and int(c.var_num_b) == 100 * int(b.var_num_b)
        and abs(c.t - b.t) < 1e-9
        and abs(c.df - b.df) < 1e-3
    )
    ok_all &= ok
    out["queries"]["q279"] = {
        "wall_s": wall, "walls": walls, "n_same_varnum_x100_t_1e9": bool(ok)
    }

    b, c, wall, walls = run("q280_spearman_rho", EV_DST)
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q280"] = {"wall_s": wall, "walls": walls, "bit_identical": bool(ok)}

    b, c, wall, walls = run("q282_wilcoxon_signed", EV_DST)
    ok = [tuple(r) for r in c] == [tuple(r) for r in b]
    ok_all &= ok
    out["queries"]["q282"] = {"wall_s": wall, "walls": walls, "bit_identical": bool(ok)}

    # --- document clone ---------------------------------------------
    b, c, wall, walls = run("q281_cramers_v", DOC_DST)
    b, c = b[0], c[0]
    ok = (
        c.n_docs == 10 * b.n_docs
        and (c.n_langs, c.n_sources) == (b.n_langs, b.n_sources)
        and abs(c.chi2 - 10.0 * b.chi2) <= 1e-9 * abs(c.chi2)
        and abs(c.cramers_v - b.cramers_v) < 1e-9
    )
    ok_all &= ok
    out["queries"]["q281"] = {
        "wall_s": wall, "walls": walls, "chi2_x10_v_invariant": bool(ok)
    }

    b, c, wall, walls = run("q283_brown_forsythe", DOC_DST)
    b, c = b[0], c[0]
    # independent Python reference ON THE CLONE (the test_wave31_refs
    # formula, lower-median centers)
    import duckdb

    rows = duckdb.connect().execute(
        r"SELECT source, len(regexp_split_to_array(trim(lower(text)), '\s+'))"
        f" FROM '{DOC_DST}/documents.parquet'"
        " WHERE text IS NOT NULL AND source IS NOT NULL"
    ).fetchall()
    groups = defaultdict(list)
    for s, x in rows:
        groups[s].append(x)
    zs = {}
    for s, xs in groups.items():
        med = sorted(xs)[(len(xs) + 1) // 2 - 1]
        zs[s] = [abs(x - med) for x in xs]
    n_tot = sum(len(v) for v in zs.values())
    k = len(zs)
    grand = sum(sum(v) for v in zs.values()) / n_tot
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in zs.values())
    ssw = sum((x - sum(v) / len(v)) ** 2 for v in zs.values() for x in v)
    f_ref = (ssb / (k - 1)) / (ssw / (n_tot - k))
    ok = (
        c.n_docs == 10 * b.n_docs
        and c.k_sources == b.k_sources
        and abs(c.f_stat - f_ref) < 1e-9
    )
    ok_all &= ok
    out["queries"]["q283"] = {
        "wall_s": wall, "walls": walls, "n_x10_f_matches_clone_ref": bool(ok)
    }

    b, c, wall, walls = run("q284_cohens_kappa", DOC_DST)
    b, c = b[0], c[0]
    ok = (
        c.n_docs == 10 * b.n_docs
        and c.n_agree == 10 * b.n_agree
        and int(c.s_chance) == 100 * int(b.s_chance)
        and c.kappa == b.kappa  # same real number -> bit-identical division
    )
    ok_all &= ok
    out["queries"]["q284"] = {
        "wall_s": wall, "walls": walls, "counts_exact_kappa_bit_identical": bool(ok)
    }

    out["all_invariants_hold"] = bool(ok_all)
    assert not math.isnan(sum(q["wall_s"] for q in out["queries"].values()))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
