"""F29 HTML alert-table extraction — the EWS web-UI scrape shred (S10/S8
HTML fallback path).

Reference: `adapters/ews_alerts.py:81-116` (`_extract_alerts_from_html`):
rows come from an ExtJS grid (``div.x-grid3-body div.x-grid3-row`` with
``div.x-grid3-cell-inner`` cells) or a plain ``<tr>``/``<td>`` table; the
longest cell is the description, the severity is the ``<img alt>`` if
present else the shortest non-empty cell; an error code (F23 regex) is
split off the description head; results dedup in first-appearance order.

This container ships no HTML library, so the shred is a small regex parser
purpose-built for those two canned shapes (printer web UIs, not arbitrary
HTML). It runs inside ``mapInPandas`` — Arrow-batched, partition-parallel,
one parse per fetched page; the Spark-side plumbing (schema, batching,
row explosion) is the operator. Swap the parser body for BeautifulSoup
where available without touching the plan shape.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html import unescape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: F23 error-code regex (`adapters/ews_alerts.py:12`).
CODE_RE = re.compile(r"\b[A-Z]\d-\d{3,5}\b")

_TAG_RE = re.compile(r"<[^>]+>")
_GRID_ROW_RE = re.compile(r'<div[^>]*class="[^"]*\bx-grid3-row\b[^"]*"[^>]*>', re.I)
_GRID_CELL_RE = re.compile(
    r'<div[^>]*class="[^"]*\bx-grid3-cell-inner\b[^"]*"[^>]*>(.*?)</div>',
    re.I | re.S,
)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.I | re.S)
_TD_RE = re.compile(r"<td[^>]*>(.*?)</td>", re.I | re.S)
_IMG_ALT_RE = re.compile(r'<img[^>]*\balt="([^"]*)"', re.I)


def _text(fragment: str) -> str:
    """Tag-stripped, entity-unescaped, trimmed text (get_text(strip=True))."""
    return unescape(_TAG_RE.sub("", fragment)).strip()


def _row_chunks(html: str) -> list[str]:
    """Row fragments: ExtJS grid rows when present, else ``<tr>`` bodies."""
    grid = html
    body = re.search(r'<div[^>]*class="[^"]*\bx-grid3-body\b[^"]*"[^>]*>', html, re.I)
    if body:
        grid = html[body.end():]
    starts = [m.start() for m in _GRID_ROW_RE.finditer(grid)]
    if starts:
        bounds = starts + [len(grid)]
        return [grid[a:b] for a, b in zip(bounds, bounds[1:])]
    return _TR_RE.findall(html)


def parse_alert_html(html: str) -> list[dict[str, str]]:
    """Reference-exact F29 parse of one page → ordered, deduped alert dicts
    ``{severity, status_code, description}``."""
    if not html:
        return []
    alerts: list[dict[str, str]] = []
    for chunk in _row_chunks(html):
        cells = [_text(c) for c in _GRID_CELL_RE.findall(chunk)]
        if not cells:
            cells = [_text(c) for c in _TD_RE.findall(chunk)]
        if not cells:
            continue
        joined = " ".join(cells).lower()
        if "description" in joined and "status code" in joined:
            continue  # header row
        desc = max(cells, key=len).strip()
        code = ""
        m = CODE_RE.search(desc)
        if m:
            code = m.group(0)
            if desc.startswith(code):
                desc = desc[len(code):].lstrip(" :.- ")
        sev = ""
        img = _IMG_ALT_RE.search(chunk)
        if img:
            sev = img.group(1).strip()
        if not sev:
            short = [t for t in cells if t]
            if short:
                sev = min(short, key=len)
        if not sev:
            sev = "unknown"
        if desc or code:
            alerts.append(
                {"severity": sev, "status_code": code, "description": desc}
            )
    uniq: list[dict[str, str]] = []
    seen: set[tuple[str, str, str]] = set()
    for a in alerts:
        key = (a["severity"], a["status_code"], a["description"])
        if key not in seen:
            uniq.append(a)
            seen.add(key)
    return uniq


def shred_alert_html(df: DataFrame, key_col: str, html_col: str) -> DataFrame:
    """Explode fetched HTML pages into alert rows, partition-parallel.

    Input: one row per device (``key_col``, ``html_col``). Output:
    ``key_col string, row_idx int, severity string, status_code string,
    description string`` — ``row_idx`` is the within-page appearance order,
    the A3 argmax tie-breaker. Pages with no alerts emit nothing (the
    caller left-joins back to keep device rows, mirroring the reference's
    offline-default channel).
    """
    src = df.select(df[key_col].cast("string").alias("_key"), df[html_col].alias("_html"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, html in zip(pdf["_key"], pdf["_html"]):
                for i, a in enumerate(parse_alert_html(html or "")):
                    rows.append(
                        {
                            key_col: key,
                            "row_idx": i,
                            "severity": a["severity"],
                            "status_code": a["status_code"],
                            "description": a["description"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[key_col, "row_idx", "severity", "status_code", "description"],
            )

    return src.mapInPandas(
        run,
        schema=(
            f"{key_col} string, row_idx int, severity string, "
            "status_code string, description string"
        ),
    )


# ---------------------------------------------------------------------------
# S10: Brother web-UI toner-level scrape.
# ---------------------------------------------------------------------------

#: Reference `adapters/brother_toner_web.py:10` — normalized code → display.
BROTHER_COLOR_PRETTY = {"BK": "Black", "K": "Black", "C": "Cyan", "M": "Magenta", "Y": "Yellow"}

# The id must END at the match (quote, whitespace, or '>') — the reference
# does an exact-id find, and without the boundary an unrelated
# #inkLevelSettings table would shadow the real level grid.
_BROTHER_TABLE_RE = re.compile(
    r'<table[^>]*\bid\s*=\s*(?:"(inkLevel(?:Mono)?)"'
    r"|'(inkLevel(?:Mono)?)'"
    r"|(inkLevel(?:Mono)?)(?=[\s>]))[^>]*>(.*?)</table>",
    re.I | re.S,
)
_TR_FULL_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.I | re.S)
_TD_FULL_RE = re.compile(r"<td([^>]*)>(.*?)</td>", re.I | re.S)
_TH_FULL_RE = re.compile(r"<th([^>]*)>(.*?)</th>", re.I | re.S)
_IMG_TAG_RE = re.compile(r"<img([^>]*)>", re.I)
_STYLE_HEIGHT_RE = re.compile(r"height\s*:\s*(\d+)", re.I)
_DIGITS_RE = re.compile(r"\d+")
_NON_ALPHA_RE = re.compile(r"[^A-Za-z]")


def _attr(attrs: str, name: str) -> str | None:
    """Value of an HTML attribute inside a raw attribute string.

    The name must not be preceded by a word char or '-': ``\\b`` alone
    matches between ``data-`` and ``height``, which would let a
    ``data-height`` attribute shadow the real ``height``.
    """
    m = re.search(
        r'(?<![-\w])' + name + r'\s*=\s*("([^"]*)"|\'([^\']*)\'|([^\s>]+))',
        attrs,
        re.I,
    )
    if not m:
        return None
    return m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4)
    )


def _brother_table(html: str):
    """(id, body) of the preferred ink-level table, or None."""
    best = None
    for m in _BROTHER_TABLE_RE.finditer(html):
        tid = (m.group(1) or m.group(2) or m.group(3)).lower()
        if tid == "inklevel":
            return tid, m.group(4)  # exact #inkLevel always wins
        if best is None:
            best = (tid, m.group(4))
    return best


def normalize_supply_label_py(text: str) -> str | None:
    """F17 `_normalize_label`, reference-exact Python twin of the Column
    form in `functions/extract.py` (for use inside the mapInPandas shred).
    Reference: `adapters/brother_toner_web.py:12-24`."""
    t = _NON_ALPHA_RE.sub("", text or "").upper()
    if not t:
        return None
    if t in {"BK", "K", "BLK", "BLACK"}:
        return "BK"
    if t in {"C", "CYAN"}:
        return "C"
    if t in {"M", "MAGENTA"}:
        return "M"
    if t in {"Y", "YELLOW"}:
        return "Y"
    return t


def _extract_img_height(td_attrs: str, td_body: str) -> int | None:
    """Reference `adapters/brother_toner_web.py:38-61`: the bar height in
    px — img ``height`` attr, then img ``style`` height, then the same two
    on the ``<td>`` itself."""
    img = _IMG_TAG_RE.search(td_body)
    if img:
        h = _attr(img.group(1), "height")
        if h:
            m = _DIGITS_RE.search(h)
            if m:
                return int(m.group(0))
        style = _attr(img.group(1), "style")
        if style:
            m = _STYLE_HEIGHT_RE.search(style)
            if m:
                return int(m.group(1))
    h = _attr(td_attrs, "height")
    if h:
        m = _DIGITS_RE.search(h)
        if m:
            return int(m.group(0))
    style = _attr(td_attrs, "style")
    if style:
        m = _STYLE_HEIGHT_RE.search(style)
        if m:
            return int(m.group(1))
    return None


def parse_brother_toner_html(html: str) -> list[dict[str, str | None]]:
    """S10: reference-exact parse of a Brother ``/general/status.html`` page
    → ordered cartridge dicts ``{cartridge, remaining_percent}``.

    Reference `adapters/brother_toner_web.py:63-95`: the ``#inkLevel``
    (color) or ``#inkLevelMono`` table holds bar-graph rows — row 1 is the
    level bars (img height in px ≙ percent), row 2 the color labels. Labels
    are F17-normalized, zipped positionally with the bar heights, heights
    F16-clamped to [0, 100] and rendered F14-style (``"42%"``). Pages with
    no level table (or a malformed one, <3 rows) yield ``[]``.

    Regex carrier for the same reason as :func:`parse_alert_html`: no HTML
    lib in this container; the two canned Brother grid shapes are the spec.
    """
    if not html:
        return []
    found = _brother_table(html)
    if found is None:
        return []
    _tid, body = found
    rows = _TR_FULL_RE.findall(body)
    if len(rows) < 3:
        return []
    heights = [
        _extract_img_height(attrs, body) for attrs, body in _TD_FULL_RE.findall(rows[1])
    ]
    labels = [
        normalize_supply_label_py(_text(body)) for _attrs, body in _TH_FULL_RE.findall(rows[2])
    ]
    # Reference-exact quirk (`adapters/brother_toner_web.py:90-92`): None
    # labels are filtered BEFORE the positional zip with heights, so a
    # non-alphabetic spacer <th> shifts the pairing by one column — the
    # reference does exactly this, and its behavior is the spec.
    labels = [x for x in labels if x]
    cartridges: list[dict[str, str | None]] = []
    for code, val in zip(labels, heights):
        pretty = BROTHER_COLOR_PRETTY.get(code, code)
        pct = None
        if val is not None:
            pct = f"{max(0, min(int(val), 100))}%"
        cartridges.append({"cartridge": pretty, "remaining_percent": pct})
    return cartridges


def brother_toner_cartridges(pages: DataFrame, key_col: str = "ip", html_col: str = "html") -> DataFrame:
    """S10 end-to-end: fetched Brother status pages → per-device cartridges
    array, the same ``(ip, cartridges array<struct<cartridge,
    remaining_percent>>)`` shape as ``snmp_toner_cartridges`` — so the
    Brother scrape drops into ``fleet_toner_report``'s A7 slot-fill and J4
    upsert path unchanged.

    The parse runs inside ``mapInPandas`` (Arrow-batched, partition-
    parallel, one parse per page); devices whose page had no level table
    keep a row with an empty array, mirroring the reference's
    ``("online", [])`` return — the offline/online triage stays with the
    fetch layer.
    """
    src = pages.select(
        pages[key_col].cast("string").alias("_key"), pages[html_col].alias("_html")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, html in zip(pdf["_key"], pdf["_html"]):
                for i, c in enumerate(parse_brother_toner_html(html or "")):
                    rows.append(
                        {
                            key_col: key,
                            "slot": i,
                            "cartridge": c["cartridge"],
                            "remaining_percent": c["remaining_percent"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[key_col, "slot", "cartridge", "remaining_percent"]
            )

    shredded = src.mapInPandas(
        run,
        schema=f"{key_col} string, slot int, cartridge string, remaining_percent string",
    )
    per_device = shredded.groupBy(key_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("slot"),
                        F.struct(
                            F.col("cartridge"), F.col("remaining_percent")
                        ).alias("c"),
                    )
                )
            ),
            lambda x: x["c"],
        ).alias("cartridges")
    )
    devices = pages.select(pages[key_col].cast("string").alias(key_col)).distinct()
    return devices.join(per_device, key_col, "left").select(
        key_col,
        F.coalesce(
            F.col("cartridges"),
            F.array().cast("array<struct<cartridge:string,remaining_percent:string>>"),
        ).alias("cartridges"),
    )
