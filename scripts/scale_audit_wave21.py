#!/usr/bin/env python
"""Round-9 wave-21 scale audit: q226's dist_rank-over-USERS under a
clone that actually grows |users| (VERDICT r8 item #6).

The standard 10x clone (scale_audit.py) copies events byte-identical,
so the r8 waves rightly skipped q226 — but Gini's total-order rank runs
over per-user counts, the one axis that clone never stresses. This
wave replicates EVENTS 10x with shifted user_id/event_id (same
ts/value/event_type), so |users| and |events| both grow 10x and the
dist_rank pass ranks 10x the rows.

Built-in exactness check: the Gini coefficient is invariant under
population replication (each copy duplicates the per-user count
multiset, so the Lorenz curve is unchanged) — the clone's gini must
equal sf0.1's to within double rounding, while n_users and n_events
must be EXACTLY 10x.

Usage: python scripts/scale_audit_wave21.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_audit import SRC, UNCHANGED  # noqa: E402
from scale_audit_wave16 import best_of  # noqa: E402

DST = os.environ.get("SCALE_USERS_DIR", "/dev/shm/peh_scale10x_users")
COPIES = int(os.environ.get("COPIES", "10"))
OFFSET = 10_000_000


def build_users_clone() -> None:
    """sf0.1 → DST: every table byte-identical EXCEPT events, replicated
    COPIES times with shifted user_id/event_id (same ts/value/type)."""
    import duckdb

    os.makedirs(DST, exist_ok=True)
    for t in UNCHANGED:
        if t == "events":
            continue
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t in ("documents", "embeddings"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + c.i * {OFFSET} AS event_id,
                 e.user_id + c.i * {OFFSET} AS user_id,
                 e.event_type, e.ts, e.value
          FROM '{SRC}/events.parquet' e,
               (SELECT unnest(range({COPIES})) AS i) c
          ORDER BY event_id
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    if not os.path.exists(f"{DST}/events.parquet"):
        build_users_clone()
    from printer_etl_hub_spark.plans import REGISTRY
    from printer_etl_hub_spark.session import get_spark

    spark = get_spark("scale-audit-w21")
    out: dict = {"clone": {"src": SRC, "dst": DST, "copies": COPIES}}

    base_row = REGISTRY["q226_user_gini"].fn(spark, SRC).collect()[0]
    wall, walls, row = best_of(
        2, lambda: REGISTRY["q226_user_gini"].fn(spark, DST).collect()[0], spark
    )
    out["q226_user_gini"] = {
        "wall_s": wall,
        "attempts": walls,
        "base": {"n_users": base_row.n_users, "n_events": base_row.n_events,
                 "gini": base_row.gini},
        "clone": {"n_users": row.n_users, "n_events": row.n_events,
                  "gini": row.gini},
        "users_exactly_10x": row.n_users == COPIES * base_row.n_users,
        "events_exactly_10x": row.n_events == COPIES * base_row.n_events,
        "gini_replication_invariant": abs(row.gini - base_row.gini) < 1e-6,
    }
    print(json.dumps({"wave21": out}, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
