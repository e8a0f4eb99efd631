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
from functools import reduce

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


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    batch_date: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
    open_end: str = "9999-12-31",
    check_unique: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: apply a snapshot of
    ``updates`` (key + tracked attrs) to a versioned dimension, keeping
    FULL history — the warehouse pattern behind every
    as-of-reconstructable dimension (reference parity: the S11 report
    upsert overwrites in place; SCD2 is its history-keeping sibling,
    composing with S12's versioned sink for time travel).

    Row fates, decided by ONE left join of current rows to updates:
    - changed (any tracked attr differs, null-safe): current row closes
      (``effective_to = batch_date``, current=false) AND a new current
      version inserts at ``batch_date``;
    - unchanged / key absent from updates: carried through untouched;
    - brand-new key: inserted as the first current version;
    - historical (already-closed) rows: never touched.

    Open versions carry ``open_end`` (default 9999-12-31) rather than a
    NULL end date — the standard warehouse sentinel, and it keeps every
    engine/pandas representation of the column comparable (NULL dates
    render as None/NaT inconsistently across the oracle boundary).

    Scale: one equi-join on the key (broadcast when the update batch is
    dimension-batch-sized, the common case) + unions — no window over
    the dimension, so history depth never enters the cost. Deterministic
    output for a given (dim, updates, batch_date): exactly oracle-able.

    HARD PRECONDITION: ``updates`` must be unique on ``key``. A duplicate
    key would fan out through the left join — duplicated closed rows and
    multiple simultaneous open versions, silently breaking the
    one-open-version invariant. ``check_unique=True`` (default) enforces
    this with one small aggregation job over the batch (batch-sized, not
    dimension-sized — negligible at any scale); pass ``check_unique=False``
    only when the caller proves uniqueness by construction.
    """
    if not attrs:
        raise ValueError("scd2_apply: attrs must name at least one tracked column")
    if check_unique:
        dup = (
            updates.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"scd2_apply: updates batch has duplicate key {key}="
                f"{dup[0][key]!r} — SCD2 requires one row per key per batch"
            )
    hist = dim.filter(~F.col(current_col))
    cur = dim.filter(F.col(current_col))
    up = updates.select(key, *attrs)
    upd = up.select(
        F.col(key).alias("_k"), *[F.col(a).alias(f"_u_{a}") for a in attrs]
    )
    joined = cur.join(F.broadcast(upd), cur[key] == F.col("_k"), "left")
    changed_pred = F.col("_k").isNotNull() & ~reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in attrs],
    )
    dim_cols = dim.columns
    # current rows that survive as-is (unchanged or not in the batch)
    keep_cur = joined.filter(~changed_pred).select(*dim_cols)
    # current rows whose version closes at the batch date
    closed = joined.filter(changed_pred).select(
        *[
            F.lit(batch_date).cast(dim.schema[to_col].dataType).alias(c)
            if c == to_col
            else (F.lit(False).alias(c) if c == current_col else F.col(c))
            for c in dim_cols
        ]
    )
    # replacement versions for changed keys
    def _new_version(src_key, attr_src):
        return [
            F.col(src_key).alias(c)
            if c == key
            else (
                attr_src(c)
                if c in attrs
                else (
                    F.lit(batch_date).cast(dim.schema[from_col].dataType).alias(c)
                    if c == from_col
                    else (
                        F.lit(open_end).cast(dim.schema[to_col].dataType).alias(c)
                        if c == to_col
                        else F.lit(True).alias(c)
                    )
                )
            )
            for c in dim_cols
        ]

    replaced = joined.filter(changed_pred).select(
        *_new_version("_k", lambda c: F.col(f"_u_{c}").alias(c))
    )
    # brand-new keys: in updates, absent from the current dimension
    fresh = upd.join(
        cur.select(F.col(key).alias("_ck")), F.col("_k") == F.col("_ck"), "left_anti"
    ).select(*_new_version("_k", lambda c: F.col(f"_u_{c}").alias(c)))
    return hist.unionByName(keep_cur).unionByName(closed).unionByName(
        replaced
    ).unionByName(fresh)
