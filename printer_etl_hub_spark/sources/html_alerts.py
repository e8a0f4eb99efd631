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
