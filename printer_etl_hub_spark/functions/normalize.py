"""Normalization scalar functions (reference F1-F10).

Each docstring cites the reference implementation it re-expresses
(paths relative to the read-only reference checkout).
All are pure Column expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference P1 bad-IP sentinel set, `core/printers.py:26` (case-insensitive).
BAD_VALUE_SENTINELS = ("", "-", "n/a", "na", "none", "0.0.0.0", "null")


def norm_ws(col: Column) -> Column:
    """F1 `_norm`: lower + trim + collapse internal whitespace.

    Reference: `core/excel/import_from_xlsm.py:25-28`.
    """
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def canonicalize_id(col: Column) -> Column:
    """F2 `canonicalize_id`: numeric → str(int(v)); else strip + newline→space.

    Reference: `core/excel/update_from_json.py:17-26`.
    """
    # try_cast BOTH steps: NaN/Infinity parse as double but have no bigint
    # value (ANSI cast would throw) — they take the string branch, exactly
    # like Python's int(float(v)) raising there.
    as_int = col.try_cast("double").try_cast("bigint")
    return F.when(as_int.isNotNull(), as_int.cast("string")).otherwise(
        F.regexp_replace(F.trim(col), r"[\n\r]+", " ")
    )


def normalize_color(col: Column) -> Column:
    """F3 `normalize_color`: substring match → Black/Cyan/Magenta/Yellow.

    Accepts one-letter k/c/m/y codes. Reference:
    `core/excel/update_from_json.py:28-40`.
    """
    s = norm_ws(col)
    return (
        F.when(s.isNull(), F.lit(None).cast("string"))
        .when(s.contains("black") | (s == "k") | (s == "bk"), "Black")
        .when(s.contains("cyan") | (s == "c"), "Cyan")
        .when(s.contains("magenta") | (s == "m"), "Magenta")
        .when(s.contains("yellow") | (s == "y"), "Yellow")
        .otherwise(F.lit(None).cast("string"))
    )


def status_online_offline(col: Column) -> Column:
    """F4 `_status_online_offline`: keyword triage to online/offline.

    Reference: `core/excel/update_from_json.py:42-58` — online keywords win,
    then offline keywords, then bare "on"/"off" fallback, default offline.
    """
    s = norm_ws(col)
    online = (
        s.contains("online")
        | s.contains("ready")
        | s.contains("idle")
        | s.contains("ok")
    )
    offline = (
        s.contains("offline")
        | s.contains("unreachable")
        | s.contains("error")
        | s.contains("down")
    )
    return (
        F.when(s.isNull() | (s == ""), "offline")
        .when(online, "online")
        .when(offline, "offline")
        .when(s.startswith("off"), "offline")
        .when(s.startswith("on"), "online")
        .otherwise("offline")
    )


def dash_if_blank(col: Column) -> Column:
    """F5 `dash_if_blank`: null/blank → "-" (sink-side sentinel).

    Reference: `core/excel/update_from_json.py:60-65`.
    """
    return F.coalesce(F.nullif(F.trim(col.cast("string")), F.lit("")), F.lit("-"))


def sanitize_control_chars(col: Column) -> Column:
    """F6 `sanitize_excel_value`: strip illegal XML control chars.

    Reference: `core/excel/update_from_json.py:8-15`.
    """
    return F.regexp_replace(col, "[\x00-\x08\x0b\x0c\x0e-\x1f]", "")


def split_postal(col: Column) -> tuple[Column, Column]:
    """F7 `_split_postal`: extract trailing 7-digit postal; strip from address.

    Returns ``(address_without_postal, postal_or_null)``.
    Reference: `core/enrich/locations.py:27-35`.
    """
    postal = F.nullif(F.regexp_extract(col, r"(\d{7})\s*$", 1), F.lit(""))
    addr = F.trim(F.regexp_replace(col, r"[\s,:-]*\d{7}\s*$", ""))
    return addr, postal


def safe_bigint(col: Column) -> Column:
    """F8 `_safe_int`: tolerant int via int(float(str(x))), else null.

    Reference: `core/enrich/locations.py:11-17`.
    """
    return col.cast("string").try_cast("double").try_cast("bigint")


def norm_text(col: Column) -> Column:
    """F9 `_norm_text`: trim + collapse whitespace, empty→null.

    Reference: `core/enrich/locations.py:19-25`.
    """
    return F.nullif(F.regexp_replace(F.trim(col), r"\s+", " "), F.lit(""))


def bytes_to_text(col: Column) -> Column:
    """F10 `_to_text`: bytes→utf-8 decode, strip NULs and b'...' wrappers.

    Reference: `adapters/snmp_toner.py:17-33`.
    """
    out = F.regexp_replace(col.cast("string"), "\x00", "")
    out = F.regexp_replace(out, r"^b'(.*)'$", r"$1")
    return out


def is_bad_value(col: Column, sentinels: tuple[str, ...] = BAD_VALUE_SENTINELS) -> Column:
    """P1 bad-value predicate: lowercased+trimmed value ∈ sentinel set, or null.

    Reference: `core/printers.py:26-36` (bad-IP filter).
    """
    s = F.lower(F.trim(col))
    return s.isNull() | s.isin(*[x for x in sentinels])
