"""The two converter entry points (SURVEY §3.3 footnote), composed.

`cli/convert_to_json.py:21-44`: promote a draft workbook to prod (S14),
scan it (S1/S3), dump to the JSON document store under the F35
serializer rules. `cli/convert_to_excel.py:22-64`: load the JSON store
(S4), MERGE into the Excel report (J4/J5), back up the prior workbook
(S12's versioning discipline applied to the file artifact), write the
updated workbook (S11). Both flows are a handful of already-tested
operators; this module is the composition the reference ships as CLIs.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..bounded import DRIVER_EXPORT_MAX_ROWS, bounded_collect
from ..edges import promote_draft
from ..operators.upsert import merge_upsert
from ..sources.json_store import load_printers_json, save_printers_json
from ..sources.tabular import read_sheet
from ..sources.xlsx import write_xlsx


def convert_to_json(
    spark: SparkSession,
    draft_xlsx: str,
    prod_xlsx: str,
    json_out: str,
    spec: dict[str, list[str]] | None = None,
    sheet: str | None = None,
    group: str = "Company_Grouped",
) -> DataFrame:
    """S14 promote → S1/S3 workbook scan → F35 JSON dump. The scanned
    rows land under ``group`` in the document store with ``seq``
    preserving sheet order (the store's order-dependent semantics —
    `sources/json_store.py`). Returns the wrapped frame."""
    from pyspark.sql import Window

    promote_draft(draft_xlsx, prod_xlsx)
    df = read_sheet(spark, prod_xlsx, spec, fmt="xlsx", sheet=sheet)
    # Sheet order → seq: the xlsx rows arrive driver-ordered (a workbook
    # is one local file), so a monotonic id keyed window is exact here.
    w = Window.orderBy(F.monotonically_increasing_id())
    wrapped = df.select(
        F.lit(group).alias("group"),
        (F.row_number().over(w) - 1).cast("bigint").alias("seq"),
        "*",
    )
    save_printers_json(wrapped, json_out)
    return wrapped


def backup_workbook(path: str, backup_dir: str) -> Path | None:
    """S12's versioning discipline on the workbook artifact: copy the
    current file to ``backup_dir/v{NNNN}_{name}`` before overwriting.
    Monotonic version numbers, no wall-clock in the name (deterministic
    under retries). No-op (returns None) when the workbook doesn't exist
    yet."""
    src = Path(path)
    if not src.exists():
        return None
    bdir = Path(backup_dir)
    bdir.mkdir(parents=True, exist_ok=True)
    n = 1 + max(
        (int(p.name.split("_", 1)[0][1:]) for p in bdir.glob("v[0-9]*_*")),
        default=0,
    )
    dst = bdir / f"v{n:04d}_{src.name}"
    shutil.copy2(src, dst)
    return dst


def convert_to_excel(
    spark: SparkSession,
    json_path: str,
    report_xlsx: str,
    key: str,
    update_cols: list[str],
    backup_dir: str | None = None,
) -> DataFrame:
    """S4 JSON load → J4/J5 MERGE into the report → S12 backup → S11
    workbook write. Returns the merged frame (also what was written).

    The workbook render is driver-side by design — a fleet report is
    thousands of rows, not a distributed dataset (the same boundary as
    `sources/json_store.py::save_printers_json`); everything before the
    render is distributed DataFrame work.
    """
    updates = load_printers_json(spark, json_path).select(key, *update_cols)
    target = read_sheet(spark, report_xlsx, fmt="xlsx")
    merged = merge_upsert(target, updates, key, update_cols)
    if backup_dir is not None:
        backup_workbook(report_xlsx, backup_dir)
    headers = merged.columns
    rows = [
        [row[c] for c in headers]
        for row in bounded_collect(
            merged, DRIVER_EXPORT_MAX_ROWS, "refresh_report workbook render"
        )
    ]
    os.makedirs(os.path.dirname(os.path.abspath(report_xlsx)), exist_ok=True)
    write_xlsx(report_xlsx, headers, rows)
    return merged
