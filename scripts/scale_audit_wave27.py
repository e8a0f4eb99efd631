#!/usr/bin/env python
"""Round-10 wave-27: q259 HITS under a 10x CUSTOMER-growth clone.

The standard clone never touches orders/lineitem, so q259's bipartite
graph needs its own growth axis (the wave-21 lesson applied to the
purchase graph): replicate orders AND lineitem 10x with shifted
o_orderkey / o_custkey / l_orderkey (same partkeys, dates, amounts), so
|customers| and |edges| grow 10x while every clone customer buys exactly
the base customer's brands.

Built-in exactness check — HITS under customer replication is EXACTLY
predictable: deg(c_i) = deg(c) for every copy, so auth1(b) = 10x base,
hub2(c_i) = 10x base hub2(c), and auth2(b) = sum over 10x customers of
10x hubs = exactly 100x base auth2. The audit asserts:

- every top-10 authority brand's score is EXACTLY 100x its base score
  (digit-string decimals compared as Python ints) with the SAME brand
  ranking;
- the hub side's top-10 is IDENTICAL to the base top-10 (same custkeys,
  same ranks) with every score exactly 10x: copies shift custkey by
  +i*OFFSET, so among the customers tied at the base maximum (the sf0.1
  graph has >10 such ties) the base keys remain the smallest and win
  the tie-break — replication changes scores, never the ranking.

Usage: python scripts/scale_audit_wave27.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import SRC  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402

DST = os.environ.get("SCALE_CUST_DIR", "/dev/shm/peh_scale10x_cust")
COPIES = int(os.environ.get("COPIES", "10"))
OFFSET = 10_000_000


def build_cust_clone() -> None:
    """sf0.1 → DST: every table byte-identical EXCEPT orders/lineitem,
    replicated COPIES times with shifted order/cust keys."""
    import duckdb

    os.makedirs(DST, exist_ok=True)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings",
    ):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT o.* REPLACE (o.o_orderkey + c.i * {OFFSET} AS o_orderkey,
                              o.o_custkey + c.i * {OFFSET} AS o_custkey)
          FROM '{SRC}/orders.parquet' o,
               (SELECT unnest(range({COPIES})) AS i) c
          ORDER BY o_orderkey
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT l.* REPLACE (l.l_orderkey + c.i * {OFFSET} AS l_orderkey)
          FROM '{SRC}/lineitem.parquet' l,
               (SELECT unnest(range({COPIES})) AS i) c
          ORDER BY l_orderkey
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        build_cust_clone()

    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w27")
    fn = REGISTRY["q259_hits"].fn

    wall, walls, n_rows = best_of(2, lambda: fn(spark, DST).count(), spark)

    base_rows = fn(spark, SRC).collect()
    clone_rows = fn(spark, DST).collect()
    base_auth = [(r.node, int(r.score)) for r in base_rows if r.side == "authority"]
    clone_auth = [(r.node, int(r.score)) for r in clone_rows if r.side == "authority"]
    auth_ok = (
        [n for n, _ in base_auth] == [n for n, _ in clone_auth]
        and all(cs == 100 * bs for (_, bs), (_, cs) in zip(base_auth, clone_auth))
    )

    base_hub = [
        (int(r.node), int(r.score), r.r) for r in base_rows if r.side == "hub"
    ]
    clone_hub = [
        (int(r.node), int(r.score), r.r) for r in clone_rows if r.side == "hub"
    ]
    hub_ok = clone_hub == [(c, 10 * s, rk) for c, s, rk in base_hub]

    print(
        json.dumps(
            {
                "wave": 27,
                "q259": {
                    "wall_10x": wall,
                    "attempts": walls,
                    "rows": n_rows,
                    "auth_scores_exactly_100x_same_ranking": auth_ok,
                    "hub_top10_identical_with_scores_exactly_10x": hub_ok,
                },
                "all_match": bool(auth_ok and hub_ok),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
