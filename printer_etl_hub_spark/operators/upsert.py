"""MERGE-style upsert (reference J4/J5, S11 Excel report upsert).

The reference updates report rows matched by canonical ID and leaves the
rest untouched (`core/excel/update_from_json.py:187-212`). Relationally that
is MERGE WHEN MATCHED THEN UPDATE — expressed here as a left join +
per-column coalesce, the Delta-less equivalent; on a Delta/Iceberg table the
same frame feeds `MERGE INTO`.

Scale: `updates` is usually much smaller than `target` — broadcast it and
the merge is a single scan of the target with no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | Sequence[str],
    update_cols: Sequence[str],
    broadcast_updates: bool = True,
    changed_flag: str | None = None,
) -> DataFrame:
    """WHEN MATCHED THEN UPDATE semantics: target row wins unless a matching
    update row provides a non-null value for an update column.

    ``updates`` column names must be ``key`` + ``update_cols``; update columns
    that collide with target columns override them via coalesce(update, target).
    """
    keys = [key] if isinstance(key, str) else list(key)
    upd = updates
    rename = {c: f"_u_{c}" for c in update_cols}
    for old, new in rename.items():
        upd = upd.withColumnRenamed(old, new)
    if broadcast_updates:
        upd = F.broadcast(upd)
    joined = target.join(upd, on=keys, how="left")
    out_cols = []
    for c in target.columns:
        if c in update_cols:
            out_cols.append(F.coalesce(F.col(rename[c]), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    # update-only columns not present on target get appended (S11 appends
    # missing report columns at write time)
    for c in update_cols:
        if c not in target.columns:
            out_cols.append(F.col(rename[c]).alias(c))
    if changed_flag:
        matched = F.lit(False)
        for c in update_cols:
            matched = matched | F.col(rename[c]).isNotNull()
        out_cols.append(matched.alias(changed_flag))
    return joined.select(*out_cols)
