"""Canonical JSON document store (reference S4/S5).

The reference keeps the whole fleet in one JSON document with two row arrays
keyed by group name (`core/printers.py:4-17`, `adapters/json_store.py:11-19`).
Here the canonical store is a DataFrame with a ``group`` discriminator column
(SURVEY.md §1.3); the exact-shape JSON document is an export format.

Scale: the JSON document form only exists at the edges. Internally rows live
in parquet (columnar, splittable); a single giant JSON file would serialize
the whole fleet through one task.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..bounded import DRIVER_EXPORT_MAX_ROWS, bounded_collect

GROUP_KEYS = ("Company_Grouped", "Branches_Grouped")


def load_printers_json(spark: SparkSession, path: str) -> DataFrame:
    """S4: whole-file JSON read → unioned rows with a ``group`` column.

    `spark.read.json(multiLine=True)` reads the document; the two group
    arrays are exploded and unioned by name (missing columns null-filled),
    with a ``seq`` column capturing input order — order-dependent reference
    semantics (first-appearance, last-wins) need it (SURVEY.md §7).
    """
    from pyspark.sql.types import ArrayType, StructType

    doc = spark.read.option("multiLine", "true").json(path)
    frames = []
    types = {f.name: f.dataType for f in doc.schema.fields}
    for g in GROUP_KEYS:
        if g not in doc.columns:
            continue
        # an EMPTY group array infers as array<string>; there are no rows to
        # contribute, and star-expanding a non-struct element would throw
        t = types[g]
        if not (isinstance(t, ArrayType) and isinstance(t.elementType, StructType)):
            continue
        rows = doc.select(F.posexplode(F.col(g)).alias("seq", "row")).select(
            F.lit(g).alias("group"), F.col("seq").cast("bigint"), F.col("row.*")
        )
        frames.append(rows)
    if not frames:
        raise ValueError(f"no group arrays {GROUP_KEYS} found in {path}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def json_serializer(obj):
    """F35 serializer rules (`core/excel/import_from_xlsm.py:30-49`):
    datetime/date/Timestamp → ISO-8601 string, numpy scalars → python
    scalars with NaN → null, anything else unknown → str. Floats that are
    NaN also become null (the reference's NaN→None normalization applied
    at every float, not only numpy's)."""
    import math
    from datetime import date, datetime

    if isinstance(obj, (datetime, date)):
        return obj.isoformat()
    try:
        import numpy as _np

        if isinstance(obj, _np.integer):
            return int(obj)
        if isinstance(obj, _np.floating):
            val = float(obj)
            return None if math.isnan(val) else val
        if isinstance(obj, _np.bool_):
            return bool(obj)
    except Exception:
        pass
    if isinstance(obj, float) and math.isnan(obj):
        return None
    return str(obj)


def _apply_serializer_rules(v):
    """Recursive pre-pass applying F35 to values json.dump would otherwise
    emit raw (NaN floats → would serialize as the non-standard ``NaN``
    token) or reject (datetime). Containers recurse; scalars pass through
    the rule table."""
    import math
    from datetime import date, datetime

    if isinstance(v, dict):
        return {k: _apply_serializer_rules(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_apply_serializer_rules(x) for x in v]
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return v


def save_printers_json(df: DataFrame, path: str) -> None:
    """S5: export the canonical frame back to the reference document shape.

    Atomic tmp+rename like `adapters/json_store.py:15-19`
    (`ensure_ascii=False, indent=2`), with the F35 serializer rules
    (timestamps → ISO strings, NaN → null) applied on the way out.
    Driver-side by design: this is an edge export of a small fleet, not a
    data path.
    """
    groups: dict[str, list] = {g: [] for g in GROUP_KEYS}
    cols = [c for c in df.columns if c not in ("group", "seq")]
    rows = bounded_collect(
        df.select("group", "seq", *cols).orderBy("group", "seq"),
        DRIVER_EXPORT_MAX_ROWS,
        "save_printers_json",
    )
    for r in rows:
        d = _apply_serializer_rules(r.asDict(recursive=True))
        g = d.pop("group")
        d.pop("seq", None)
        groups.setdefault(g, []).append({k: v for k, v in d.items() if v is not None})
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(groups, f, ensure_ascii=False, indent=2, default=json_serializer)
    os.replace(tmp, path)
