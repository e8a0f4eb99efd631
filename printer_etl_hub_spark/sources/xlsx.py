"""Minimal stdlib XLSX/XLSM reader + writer (no openpyxl/pandas-excel).

An ``.xlsx``/``.xlsm`` workbook is a zip of XML parts; reading sheet cells
needs only ``zipfile`` + ``ElementTree``: workbook.xml names the sheets,
the .rels part maps them to worksheet XML files, sharedStrings.xml holds
the string pool, and each ``<c>`` cell carries its type + value. That is
everything the reference's S1/S2 scans consume
(`core/excel/import_from_xlsm.py:86-134` via pandas/openpyxl); this module
is the byte decoder that upgrades `sources/tabular.py`'s CSV/JSONL carrier
to the real workbook format.

Scope (documented honestly):
- READ: shared/inline/formula-cached strings, numbers, booleans; gaps pad
  to None. Date cells ARE interpreted (round 4): a numeric cell whose
  style resolves to a date-rendering number format (built-in ids 14-22,
  27-36, 45-47, 50-58, or a custom format whose code contains date
  tokens) converts from its Excel serial through the workbook's epoch
  (1900 system via the 1899-12-30 base, or 1904 when ``workbookPr
  date1904`` is set) to ``datetime``/``date`` objects — which then render
  ISO-8601 through the F35 serializer rules wherever they surface
  (frame stringification, JSON export, workbook write-back).
- WRITE: a single-sheet workbook with inline strings/numbers — enough for
  the S11 report-sink story (MERGE result → workbook); datetime/date
  values write as F35 ISO strings. VBA preservation (.xlsm keep_vba) is
  an in-place patch concern the engine leaves to a driver-side openpyxl
  post-step where that library exists (SURVEY §2.1).

Workbook files are driver-sized by format (≤~10^6 rows); parsing is a
driver-side metadata step, the resulting frame computes distributed.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """A→0, B→1, …, AA→26 (cell reference column letters)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; itertext over the si collects
        # both (phonetic runs excluded)
        texts = [t.text or "" for t in si.iter(f"{_NS}t")]
        out.append("".join(texts))
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """Sheet name → worksheet zip path, in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    by_id = {
        r.get("Id"): r.get("Target")
        for r in rels.findall(f"{rel_ns}Relationship")
    }
    out: dict[str, str] = {}
    for sh in wb.iter(f"{_NS}sheet"):
        target = by_id.get(sh.get(f"{_NS_REL}id"), "")
        if not target:
            continue
        if target.startswith("/"):
            target = target.lstrip("/")
        elif not target.startswith("xl/"):
            target = f"xl/{target}"
        out[sh.get("name")] = target
    return out


#: Built-in number-format ids that render as dates/times (ECMA-376 §18.8.30;
#: 27-36 and 50-58 are the East Asian date variants).
_DATE_BUILTIN_IDS = (
    frozenset(range(14, 23))
    | frozenset(range(27, 37))
    | frozenset(range(45, 48))
    | frozenset(range(50, 59))
)


def _is_date_format_code(code: str) -> bool:
    """True when a custom format code renders a date/time: contains a
    y/m/d/h/s token outside quoted literals, ``[]`` sections, and escapes
    (the same heuristic openpyxl/pandas apply).

    ELAPSED formats (``[h]:mm:ss``, ``[mm]:ss`` …) are durations, not
    dates — converting a 732-elapsed-hours cell through the date epoch
    would destroy the value — so a bracketed time token disqualifies."""
    stripped = re.sub(r'"[^"]*"', "", code)
    if re.search(r"\[(h+|m+|s+)\]", stripped, re.I):
        return False
    stripped = re.sub(r"\[[^\]]*\]", "", stripped)
    stripped = re.sub(r"\\.", "", stripped)
    return bool(re.search(r"[ymdhs]", stripped, re.I))


def _date_style_ids(zf: zipfile.ZipFile) -> frozenset[int]:
    """Indices into cellXfs (the cell ``s`` attribute) whose number format
    renders as a date."""
    try:
        data = zf.read("xl/styles.xml")
    except KeyError:
        return frozenset()
    root = ET.fromstring(data)
    custom = {
        int(nf.get("numFmtId", "-1")): nf.get("formatCode", "")
        for nf in root.iter(f"{_NS}numFmt")
    }
    cellxfs = root.find(f"{_NS}cellXfs")
    if cellxfs is None:
        return frozenset()
    ids = set()
    for i, xf in enumerate(cellxfs.findall(f"{_NS}xf")):
        fmt = int(xf.get("numFmtId", "0"))
        if fmt in _DATE_BUILTIN_IDS or (
            fmt in custom and _is_date_format_code(custom[fmt])
        ):
            ids.add(i)
    return frozenset(ids)


def _workbook_date1904(zf: zipfile.ZipFile) -> bool:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    pr = wb.find(f"{_NS}workbookPr")
    return pr is not None and (pr.get("date1904") or "").lower() in ("1", "true")


def _serial_to_datetime(num: float, date1904: bool):
    """Excel serial → datetime (date when the time-of-day is zero).

    1900 system counts from the 1899-12-30 base (the standard conversion
    that absorbs Excel's phantom 1900-02-29 for serials ≥ 61); 1904 system
    counts from 1904-01-01. Sub-day fractions round to the nearest
    millisecond to undo binary float jitter."""
    from datetime import datetime, timedelta

    epoch = datetime(1904, 1, 1) if date1904 else datetime(1899, 12, 30)
    ms = round(num * 86400_000)
    dt = epoch + timedelta(milliseconds=ms)
    if dt.hour == dt.minute == dt.second == dt.microsecond == 0:
        return dt.date()
    return dt


def _cell_value(
    c: ET.Element,
    strings: list[str],
    date_styles: frozenset[int] = frozenset(),
    date1904: bool = False,
):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return strings[int(raw)]
    if t == "str":
        return raw
    if t == "b":
        return raw == "1"
    if t == "e":  # error cell (#N/A …) — the reference sees None via pandas
        return None
    num = float(raw)
    if date_styles:
        s = c.get("s")
        if s is not None and int(s) in date_styles and num >= 0:
            try:
                return _serial_to_datetime(num, date1904)
            except (OverflowError, ValueError):
                pass  # absurd serial: fall through to the raw number
    return int(num) if num.is_integer() else num


def read_xlsx_rows(
    path: str, sheet: str | None = None
) -> list[list]:
    """All cell rows of one worksheet as rectangular lists (gaps → None).

    ``sheet``: worksheet name; None = first sheet. Raises KeyError for an
    unknown sheet name.
    """
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        if not targets:
            return []
        if sheet is None:
            target = next(iter(targets.values()))
        else:
            if sheet not in targets:
                raise KeyError(f"sheet {sheet!r} not in {sorted(targets)}")
            target = targets[sheet]
        strings = _shared_strings(zf)
        date_styles = _date_style_ids(zf)
        date1904 = _workbook_date1904(zf)
        root = ET.fromstring(zf.read(target))
        rows: list[list] = []
        max_w = 0
        last_row = 0
        for row_el in root.iter(f"{_NS}row"):
            r_idx = int(row_el.get("r", last_row + 1))
            while last_row < r_idx - 1:  # skipped (entirely empty) rows
                rows.append([])
                last_row += 1
            vals: list = []
            next_col = 0
            for c in row_el.findall(f"{_NS}c"):
                ref = c.get("r")
                col = (
                    _col_index(_CELL_REF_RE.match(ref).group(1))
                    if ref
                    else next_col
                )
                while len(vals) < col:
                    vals.append(None)
                vals.append(_cell_value(c, strings, date_styles, date1904))
                next_col = col + 1
            rows.append(vals)
            last_row = r_idx
            max_w = max(max_w, len(vals))
        for vals in rows:
            vals.extend([None] * (max_w - len(vals)))
        return rows


def write_xlsx(
    path: str, headers: list[str], rows: list[list], sheet_name: str = "Sheet1"
) -> None:
    """Write a single-sheet workbook (inline strings, no styles) — the S11
    sink's portable carrier. Strings escape through ElementTree; numbers
    write as numeric cells; None cells are omitted (read back as None)."""

    from datetime import date as _date
    from datetime import datetime as _datetime

    def _row_xml(r_idx: int, vals: list) -> str:
        cells = []
        for ci, v in enumerate(vals):
            if v is None:
                continue
            if isinstance(v, (_datetime, _date)):
                from .json_store import json_serializer

                v = json_serializer(v)  # the one F35 date→ISO rule
            ref = ""
            n = ci + 1
            while n:
                n, rem = divmod(n - 1, 26)
                ref = chr(ord("A") + rem) + ref
            ref = f"{ref}{r_idx}"
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                el = ET.Element("t")
                el.text = str(v)
                t_xml = ET.tostring(el, encoding="unicode")
                cells.append(f'<c r="{ref}" t="inlineStr"><is>{t_xml}</is></c>')
        return f'<row r="{r_idx}">' + "".join(cells) + "</row>"

    body = [_row_xml(1, list(headers))]
    body += [_row_xml(i + 2, list(r)) for i, r in enumerate(rows)]
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    from xml.sax.saxutils import quoteattr

    # attribute context: quoteattr escapes quotes too (text escaping alone
    # would let a '"' in the sheet name break out of the attribute)
    sheet_name_attr = quoteattr(sheet_name)
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" '
        f'xmlns:r="{_NS_REL[1:-1]}">'
        f'<sheets><sheet name={sheet_name_attr} sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    rels_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    workbook_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{rels_ns}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{rels_ns}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", workbook_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
