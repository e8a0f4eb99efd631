#!/usr/bin/env python
"""Round-10 wave-25: q255 ExactSubstr excision at 10x.

The standard clone replicates every sf0.1 document 10 ways, so EVERY
20-token window of every >= 20-token document becomes cross-document
duplicated — the worst case for the window-hash df-count (every
posting survives the semi-join) AND the strongest correctness
invariant: each such document must excise to kept_frac = 0 with
n_dup_tokens = n_tokens (full coverage collapses the interval-merge
fold to a single [1, n] interval — the linearity claim made
observable), while documents shorter than k keep everything.

Expected deterministic counts: rows = 50 000 (one per doc, always);
fully-excised docs = 10 x the sf0.1 count of >= 20-token docs;
n_dup_tokens = 0 for every shorter doc.

Usage: python scripts/scale_audit_wave25.py
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
    from pyspark.sql import functions as F

    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark
    from printer_etl_hub_spark.tables import load_tables

    spark = get_spark("scale-audit-w25")
    fn = REGISTRY["q255_exactsubstr"].fn

    wall, walls, n_rows = best_of(2, lambda: fn(spark, DST).count(), spark)

    res = fn(spark, DST)
    agg = res.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_tokens") >= 20).cast("int")).alias("n_long"),
        F.sum(
            ((F.col("n_tokens") >= 20) & (F.col("kept_frac") == 0.0)).cast("int")
        ).alias("n_long_fully_excised"),
        F.sum(
            ((F.col("n_tokens") < 20) & (F.col("n_dup_tokens") > 0)).cast("int")
        ).alias("n_short_touched"),
    ).collect()[0]

    # sf0.1 ground truth for the invariant's expected magnitude
    src_long = (
        load_tables(spark, SRC)["documents"]
        .select(F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"))
        .filter(F.col("n") >= 20)
        .count()
    )

    ok = (
        n_rows == 50_000
        and agg.n == 50_000
        and agg.n_long == agg.n_long_fully_excised == 10 * src_long
        and agg.n_short_touched == 0
    )
    print(
        json.dumps(
            {
                "wave": 25,
                "query": "q255_exactsubstr",
                "wall_s": wall,
                "attempts": walls,
                "rows": n_rows,
                "n_long": agg.n_long,
                "n_long_fully_excised": agg.n_long_fully_excised,
                "n_short_touched": agg.n_short_touched,
                "expected_long": 10 * src_long,
                "all_match": ok,
            }
        )
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
