#!/usr/bin/env python
"""Round-10 wave-26: q256 chi-square keyness + q257 edit-distance dedup
at 10x.

The standard clone (10 copies of every sf0.1 document, shifted ids,
identical text) stresses each operator differently:

- q256: every 2x2 cell (a, b, c, d, N) scales EXACTLY 10x, so chi2
  scales exactly 10x and the per-source keyword RANKING is invariant —
  the audit asserts the (source, token) keyword set is IDENTICAL to the
  base corpus run and every n_tok is exactly 10x its base value. A plan
  that double-counts under the clone's duplicate mass (or lets float
  noise into the ranking) breaks the set equality.

- q257: every base block's population multiplies by 10, so blocks with
  base size > 6 cross the 64-doc stop-block cap and must DROP (the
  winnow max_bucket lesson: template mass must not fan out — Levenshtein
  is O(len^2) PER PAIR, so a runaway block costs quadratically twice).
  For the surviving blocks the output is exactly computable from base
  facts: each base doc contributes C(10,2) = 45 dist-0 copy pairs, each
  base qualifying pair contributes 10*10 = 100 cross-copy pairs (same
  distance — texts are identical). expected = 45*n_docs_surviving +
  100*n_base_pairs_surviving.

Usage: python scripts/scale_audit_wave26.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import DST, SRC, build_clone  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402


def _q257_base_expectation() -> dict:
    """Base-corpus facts that pin the 10x output exactly (DuckDB)."""
    import duckdb

    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id, lower(trim(text)) AS t
          FROM '{SRC}/documents.parquet'
        ), b AS (
          SELECT doc_id, t, length(t) AS ln,
                 CAST(floor(length(t) / 32) AS INT) AS lb,
                 substr(t, 1, 8) AS pf
          FROM d
        ), sz AS (
          SELECT lb, pf, count(*) AS c FROM b GROUP BY lb, pf
        ), surv AS (          -- blocks whose 10x population <= the 64 cap
          SELECT lb, pf FROM sz WHERE c * 10 <= 64
        ), bb AS (
          SELECT b.* FROM b JOIN surv USING (lb, pf)
        ), base_pairs AS (
          SELECT count(*) AS p FROM bb a JOIN bb c2
            ON a.lb = c2.lb AND a.pf = c2.pf AND a.doc_id < c2.doc_id
          WHERE levenshtein(a.t, c2.t) * 100 <= 10 * greatest(a.ln, c2.ln)
        )
        SELECT (SELECT count(*) FROM bb) AS n_docs_surv,
               (SELECT p FROM base_pairs) AS n_pairs_surv,
               (SELECT count(*) FROM sz WHERE c * 10 > 64) AS n_blocks_dropped
        """
    ).fetchone()
    return {
        "n_docs_surv": row[0],
        "n_pairs_surv": row[1],
        "n_blocks_dropped": row[2],
        "expected_pairs_10x": 45 * row[0] + 100 * row[1],
    }


def main() -> None:
    if not os.path.exists(f"{DST}/documents.parquet"):
        build_clone()

    from pyspark.sql import functions as F

    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w26")
    fn256 = REGISTRY["q256_chi2_keyness"].fn
    fn257 = REGISTRY["q257_edit_dups"].fn

    # ---- q257 at 10x: stop-block cap fires, survivors exactly predicted
    exp = _q257_base_expectation()
    wall257, walls257, n_pairs = best_of(2, lambda: fn257(spark, DST).count(), spark)
    pairs_ok = n_pairs == exp["expected_pairs_10x"]
    # every copy pair of an identical text must report dist = 0
    zero_ok = (
        fn257(spark, DST)
        # copies of one base doc share doc_id mod the clone OFFSET
        .filter((F.col("a_id") % 10_000_000) == (F.col("b_id") % 10_000_000))
        .filter(F.col("dist") != 0)
        .count()
        == 0
    )

    # ---- q256 at 10x: keyword set invariant, counts exactly 10x
    wall256, walls256, n256 = best_of(2, lambda: fn256(spark, DST).count(), spark)
    base = {
        (r.source, r.token): (r.n_tok, r.krank)
        for r in fn256(spark, SRC).collect()
    }
    ten = {
        (r.source, r.token): (r.n_tok, r.krank)
        for r in fn256(spark, DST).collect()
    }
    set_ok = set(base) == set(ten)
    scale_ok = set_ok and all(
        ten[k][0] == 10 * base[k][0] and ten[k][1] == base[k][1] for k in base
    )

    print(
        json.dumps(
            {
                "wave": 26,
                "q257": {
                    "wall_10x": wall257,
                    "attempts": walls257,
                    "pairs_10x": n_pairs,
                    **exp,
                    "pairs_match": pairs_ok,
                    "copy_pairs_all_dist0": zero_ok,
                },
                "q256": {
                    "wall_10x": wall256,
                    "attempts": walls256,
                    "rows_10x": n256,
                    "keyword_set_identical": set_ok,
                    "counts_and_ranks_exactly_10x": scale_ok,
                },
                "all_match": bool(pairs_ok and zero_ok and set_ok and scale_ok),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
