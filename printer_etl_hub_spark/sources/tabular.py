"""Tabular sheet ingest with the reference's header semantics (S1-S3).

The reference reads Excel sheets three ways (this container has no xlsx
libs, so the semantics are implemented over CSV/JSON-lines — the header
logic is byte-identical, only the byte decoder differs):

- S1 spec'd scan with fuzzy header→key matching and positional fallback
  (`core/excel/import_from_xlsm.py:51-84`): normalized lowercase /
  whitespace-collapsed match; a spec'd column whose header is missing is
  taken by position.
- S2 synonym resolution (`adapters/employee_source.py:6-42`): each logical
  column has a list of accepted header spellings, incl. Hebrew
  (e.g. branch id = "מספר סניף").
- S3 inferred scan (`adapters/location_source.py:6-57`): keep every
  non-empty header, suffix duplicate headers ``_2, _3…``, skip
  all-empty rows.

Header resolution is DRIVER-side (schema work, bytes-cheap); the row scan
stays a distributed Spark CSV/JSON read — at 100 TB the scan parallelizes
by file split while the header decision is one metadata read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _norm_header(h: str) -> str:
    """Reference F1 `_norm` applied to headers: lower + trim + collapse ws."""
    return " ".join(str(h).strip().lower().split())


def dedup_headers(headers: list[str]) -> list[str]:
    """S3 duplicate-header suffixing (`adapters/location_source.py:6-21`):
    second occurrence of a header becomes ``name_2``, third ``name_3``…"""
    seen: dict[str, int] = {}
    out = []
    for h in headers:
        n = seen.get(h, 0) + 1
        seen[h] = n
        out.append(h if n == 1 else f"{h}_{n}")
    return out


def resolve_headers(
    actual: list[str],
    spec: dict[str, list[str]],
    *,
    positional_fallback: bool = True,
) -> dict[str, str]:
    """S1/S2 fuzzy header resolution: logical name → actual header.

    ``spec`` maps each logical column to its accepted spellings (the logical
    name itself is always accepted). Matching is on normalized headers;
    logical columns with no header match fall back to the spec-position
    column (`core/excel/import_from_xlsm.py:73-84`) when enabled.
    Raises if a logical column cannot be resolved.
    """
    norm_actual = {_norm_header(h): h for h in actual}
    resolved: dict[str, str] = {}
    taken: set[str] = set()
    missing: list[tuple[int, str]] = []
    for pos, (logical, synonyms) in enumerate(spec.items()):
        hit = None
        for cand in [logical, *synonyms]:
            h = norm_actual.get(_norm_header(cand))
            if h is not None and h not in taken:
                hit = h
                break
        if hit is None:
            missing.append((pos, logical))
            continue
        resolved[logical] = hit
        taken.add(hit)
    for pos, logical in missing:
        if not positional_fallback or pos >= len(actual) or actual[pos] in taken:
            raise ValueError(f"cannot resolve column {logical!r} in {actual}")
        resolved[logical] = actual[pos]
        taken.add(actual[pos])
    return resolved


def _raw_csv_headers(path: str) -> list[str] | None:
    """First header line of the (first) CSV file, exactly as written."""
    import csv
    import glob
    import os

    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "*.csv")))
    else:
        cands = sorted(glob.glob(path)) or [path]
    if not cands or not os.path.isfile(cands[0]):
        return None
    with open(cands[0], newline="", encoding="utf-8") as fh:
        return next(csv.reader(fh), None)


def _xlsx_frame(
    spark: SparkSession, rows: list[list], header_row: int = 0
) -> DataFrame:
    """Worksheet rows → all-string DataFrame, headers from ``header_row``
    (reference-exact `_2` dedup suffixing). Cell values stringify the same
    way the CSV carrier delivers them (None stays null), so every
    downstream header/normalization rule is carrier-independent."""
    from pyspark.sql.types import StringType, StructField, StructType

    if len(rows) <= header_row:
        raise ValueError("worksheet has no header row")
    headers = dedup_headers(
        [
            str(h) if h is not None and str(h).strip() else f"_c{i}"
            for i, h in enumerate(rows[header_row])
        ]
    )
    from datetime import date as _date
    from datetime import datetime as _datetime

    from .json_store import json_serializer

    def _cell_str(v):
        if v is None:
            return None
        if isinstance(v, (_datetime, _date)):
            return json_serializer(v)  # the one F35 date→ISO rule
        return str(v)

    data = [[_cell_str(v) for v in r] for r in rows[header_row + 1:]]
    schema = StructType([StructField(h, StringType()) for h in headers])
    return spark.createDataFrame(data, schema)


def read_sheet(
    spark: SparkSession,
    path: str,
    spec: dict[str, list[str]] | None = None,
    *,
    fmt: str = "csv",
    sheet: str | None = None,
    drop_all_null: bool = True,
) -> DataFrame:
    """Spec'd (S1/S2) or inferred (S3) sheet scan over CSV / JSON-lines /
    real XLSX-XLSM workbooks (stdlib zip+XML decoder, ``sources/xlsx.py``).

    - spec given → fuzzy-resolve + prune/rename to the logical columns;
    - spec None → keep every header, duplicate headers suffixed ``_2…``;
    - empty strings normalize to null first, then all-null rows drop
      (P6, `core/excel/import_from_xlsm.py:79-84`).
    """
    if fmt in ("xlsx", "xlsm"):
        from .xlsx import read_xlsx_rows

        df = _xlsx_frame(spark, read_xlsx_rows(path, sheet))
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(path)
        # Spark renames duplicate CSV headers to name0/name1; recover the raw
        # header row (one driver-side metadata read) for reference-exact
        # fuzzy matching and _2/_3 dedup suffixes.
        raw = _raw_csv_headers(path)
        if raw is not None and len(raw) == len(df.columns):
            df = df.toDF(*dedup_headers(raw))
    elif fmt in ("json", "jsonl"):
        # PERMISSIVE + corrupt-record channel: the ingestion analog of the
        # reference's tolerant parsing (F26) — malformed rows survive as
        # raw text in _corrupt_record instead of killing the load
        df = (
            spark.read.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    else:
        raise ValueError(f"unsupported fmt {fmt!r}")

    if spec is not None:
        mapping = resolve_headers(df.columns, spec)
        df = df.select(
            *[F.col(f"`{actual}`").alias(logical) for logical, actual in mapping.items()]
        )

    # "" → null so drop("all") matches the reference's (None, "", []) test
    df = df.select(
        *[
            F.nullif(F.col(f"`{c}`"), F.lit("")).alias(c)
            if dict(df.dtypes)[c] == "string"
            else F.col(f"`{c}`")
            for c in df.columns
        ]
    )
    return df.na.drop("all") if drop_all_null else df


#: P10 expected header names (`core/excel/update_from_json.py:140`).
EXPECTED_REPORT_HEADERS = frozenset(
    {
        "id",
        "status",
        "black",
        "cyan",
        "magenta",
        "yellow",
        "error",
        "severity",
        "toner type",
        "type",
    }
)


def find_header_row(
    rows: list[list],
    expected: frozenset[str] | set[str] = EXPECTED_REPORT_HEADERS,
    max_scan_rows: int = 20,
) -> tuple[int | None, dict[str, int]]:
    """P10 header-row detector (`core/excel/update_from_json.py:137-162`).

    Scan the first ≤``max_scan_rows`` rows; each row scores 1 per non-empty
    cell whose normalized text is an expected header name. A candidate row
    must contain "id" (case/space-insensitive); the best strictly-higher
    score wins, first such row on ties. Returns (0-based row index,
    header-name → 0-based column index) or (None, {}).
    """
    best_row: int | None = None
    best_score = -1
    best_map: dict[str, int] = {}
    for r, row in enumerate(rows[:max_scan_rows]):
        names: list[str] = []
        cols: list[int] = []
        score = 0
        for c, v in enumerate(row):
            if v is None:
                continue
            name = str(v).strip()
            if not name:
                continue
            names.append(name)
            cols.append(c)
            if name.lower() in expected:
                score += 1
        # Duplicate headers get the S3 ``_2`` suffix here too, so the map
        # points every occurrence at its own column instead of the last
        # occurrence silently winning.
        row_map = dict(zip(dedup_headers(names), cols))
        if "id" in {n.strip().lower() for n in names} and score > best_score:
            best_row = r
            best_score = score
            best_map = row_map
    if best_row is None:
        return None, {}
    return best_row, best_map


def _raw_csv_rows(path: str, limit: int) -> list[list[str]]:
    """First ``limit`` parsed rows of the (first) CSV file — driver-side
    metadata read, same access pattern as `_raw_csv_headers`."""
    import csv
    import glob
    import itertools
    import os

    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "*.csv")))
    else:
        cands = sorted(glob.glob(path)) or [path]
    if not cands or not os.path.isfile(cands[0]):
        return []
    with open(cands[0], newline="", encoding="utf-8") as fh:
        return list(itertools.islice(csv.reader(fh), limit))


def read_sheet_detect_header(
    spark: SparkSession,
    path: str,
    spec: dict[str, list[str]] | None = None,
    *,
    fmt: str = "csv",
    sheet: str | None = None,
    expected: frozenset[str] | set[str] = EXPECTED_REPORT_HEADERS,
    drop_all_null: bool = True,
) -> DataFrame:
    """S1 scan over a sheet whose header is NOT row 1 (title/banner rows
    above it) — the P10 path of the S11 report sink
    (`core/excel/update_from_json.py:137-162` feeding `:187-212`).

    The header row is detected driver-side from the first ≤20 parsed rows
    (one tiny metadata read); the full scan stays a distributed Spark CSV
    read with ``header=false``, and the title-row prefix is dropped by
    file-order row number. Worksheet-shaped inputs are bounded by the
    workbook format (≤~10^6 rows), so the single global ordering window is
    metadata-cheap; at lake scale, headers belong in table metadata — this
    operator exists to ingest the workbook world, not to replace it.
    """
    from pyspark.sql import Window

    if fmt in ("xlsx", "xlsm"):
        # Workbook carrier: the file is a driver-side read by format; detect
        # and slice in one pass, then hand the frame to the common tail.
        from .xlsx import read_xlsx_rows

        rows = read_xlsx_rows(path, sheet)
        header_row, _ = find_header_row(rows, expected)
        if header_row is None:
            raise ValueError(
                f"no header row with 'id' found in first 20 rows of {path}"
            )
        df = _xlsx_frame(spark, rows, header_row)
        if spec is not None:
            mapping = resolve_headers(df.columns, spec)
            df = df.select(
                *[F.col(f"`{a}`").alias(logical) for logical, a in mapping.items()]
            )
        df = df.select(
            *[
                F.nullif(F.col(f"`{c}`"), F.lit("")).alias(c)
                if dict(df.dtypes)[c] == "string"
                else F.col(f"`{c}`")
                for c in df.columns
            ]
        )
        return df.na.drop("all") if drop_all_null else df

    # Title-row skipping is a PER-FILE notion; with several files the global
    # row_number would drop the wrong rows (Spark orders splits by size, not
    # name) and other files' banner/header rows would survive as data. A
    # worksheet export is one file — enforce that instead of mis-parsing.
    import glob as _glob
    import os as _os

    matches = (
        sorted(_glob.glob(_os.path.join(path, "*.csv")))
        if _os.path.isdir(path)
        else sorted(_glob.glob(path)) or [path]
    )
    if len(matches) > 1:
        raise ValueError(
            f"read_sheet_detect_header needs a single sheet file; {path} "
            f"matches {len(matches)} files — detect per file and union"
        )

    prefix = _raw_csv_rows(path, 20)
    # The name→column map is part of find_header_row's P10 contract (and
    # unit-tested); this caller rebuilds headers from the FULL row below
    # because unnamed columns also need _cN placeholders.
    header_row, _ = find_header_row(prefix, expected)
    if header_row is None:
        raise ValueError(f"no header row with 'id' found in first 20 rows of {path}")
    headers = dedup_headers(
        [h if str(h).strip() else f"_c{i}" for i, h in enumerate(prefix[header_row])]
    )

    # Read with an EXPLICIT all-string schema sized to the detected header
    # row. Inferring the column count from the file's first row would let a
    # banner/title row narrower than the header (e.g. "Fleet report" with
    # no commas) silently truncate every later column of all data rows.
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField(h, T.StringType()) for h in headers])
    df = spark.read.option("header", "false").schema(schema).csv(path)
    # monotonically_increasing_id is partition-prefixed and in-partition
    # sequential, and file-source partitions follow split order — so it is a
    # valid FILE-ORDER sort key for a narrow CSV scan (no shuffle yet).
    df = df.withColumn("_mid", F.monotonically_increasing_id())
    df = (
        df.withColumn(
            "_rn", F.row_number().over(Window.orderBy(F.col("_mid"))) - F.lit(1)
        )
        .filter(F.col("_rn") > F.lit(header_row))
        .drop("_mid", "_rn")
    )

    if spec is not None:
        mapping = resolve_headers(df.columns, spec)
        df = df.select(
            *[F.col(f"`{a}`").alias(logical) for logical, a in mapping.items()]
        )
    df = df.select(
        *[
            F.nullif(F.col(f"`{c}`"), F.lit("")).alias(c)
            if dict(df.dtypes)[c] == "string"
            else F.col(f"`{c}`")
            for c in df.columns
        ]
    )
    return df.na.drop("all") if drop_all_null else df


#: Reference sheet specs (`core/excel/import_from_xlsm.py:14-23`) with the
#: S2 synonym lists (`adapters/employee_source.py:6-42`) — Hebrew included.
EMPLOYEE_SPEC = {
    "id": ["employee id", "emp id", "מספר סניף", "branch id"],
    "name": ["employee name", "full name", "שם"],
    "phone": ["phone number", "tel", "טלפון"],
}
COMPANY_SHEET_SPEC = {
    "ID": [],
    "Floor": [],
    "Printer IP": ["IP", "ip"],
    "Type": [],
    "Serial": [],
    "Comment": [],
}
