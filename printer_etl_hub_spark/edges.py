"""Driver-side edge adapters: ticket rendering, email-draft sink, file
staging, CLI parsing (reference S13/S14/F39/F40).

These are deliberately NOT Spark operators — they sit at the pipeline's
edges, fed by ``collect()`` of small result frames (a point-lookup ticket,
a promotion of one workbook). SURVEY.md §2.1 scopes them driver-side; they
live here so a user of the reference can run the same end-to-end flow:
point lookup (J6/q12) → extract → render (F39) → .eml draft (S13).

The Outlook COM path (`adapters/mailer.py:8-23`) is Windows-only and has
no analog in this environment; the portable ``.eml`` draft fallback
(`adapters/mailer.py:25-38`) is the implemented sink.
"""

from __future__ import annotations

import html as _html
import os
import shutil
from email.message import EmailMessage
from email.policy import default as _default_policy
from pathlib import Path

#: RTL ticket strings (reference `plugins/openticket/TonerOrder.py:152-195`).
_TICKET_TITLE = "הזמנות טונרים"
_SUBJECT_BASE = "הזמנת טונרים"
_FIELD_LABELS = (
    ("customer", "שם הלקוח"),
    ("serial", "מספר סידורי"),
    ("model", "דגם המכשיר"),
    ("_colors", "צבע טונר"),
    ("_qty", "כמות טונרים"),
    ("address", "כתובת מלאה לאספקת המשלוח"),
    ("contact", "שם איש קשר"),
    ("phone", "מספר טלפון נייד"),
)


def str2bool(v: str) -> bool:
    """F40 CLI boolean parse (`settings/arguments.py:6-12`): accepts the
    usual true/false spellings, raises ValueError otherwise (argparse
    wraps it into ArgumentTypeError via ``type=str2bool``)."""
    s = str(v).strip().lower()
    if s in ("1", "true", "t", "yes", "y", "on"):
        return True
    if s in ("0", "false", "f", "no", "n", "off"):
        return False
    raise ValueError(f"boolean value expected, got {v!r}")


def promote_draft(draft: str | os.PathLike, prod: str | os.PathLike) -> None:
    """S14 draft→prod promotion (`adapters/excel_io.py:18-22`): copy the
    draft over the production path (metadata-preserving), creating parent
    dirs; a self-copy is a no-op."""
    draft_p, prod_p = Path(draft), Path(prod)
    prod_p.parent.mkdir(parents=True, exist_ok=True)
    if draft_p.resolve() == prod_p.resolve():
        return
    shutil.copy2(draft_p, prod_p)


def make_ticket_subject(fields: dict) -> str:
    """F39 subject line (`plugins/openticket/TonerOrder.py:152-160`):
    base + " - customer | model" when present, branch id suffixed in
    brackets for non-company groups."""
    parts = [p for p in (fields.get("customer"), fields.get("model")) if p]
    subject = f"{_SUBJECT_BASE} - " + " | ".join(parts) if parts else _SUBJECT_BASE
    branch = str(fields.get("branch_id", "")).strip()
    if fields.get("group") != "Company_Grouped" and branch:
        subject = f"{subject} [{branch}]"
    return subject


def render_ticket_html(fields: dict) -> str:
    """F39 RTL ticket table (`plugins/openticket/TonerOrder.py:162-195`):
    every value HTML-escaped; ``items`` (list of {color, qty}) folds to a
    single color name for one line or "color × qty" joins for several,
    plus the summed quantity."""
    items = fields.get("items", [])
    if len(items) == 1:
        colors = _html.escape(str(items[0]["color"]))
        qty_total = int(items[0]["qty"])
    else:
        colors = ", ".join(
            f"{_html.escape(str(it['color']))} × {int(it['qty'])}" for it in items
        )
        qty_total = sum(int(it["qty"]) for it in items)
    values = {
        "_colors": colors,
        "_qty": str(qty_total),
    }
    cell = "padding:8px 12px;border:1px solid #bbb;"
    rows = []
    for key, label in _FIELD_LABELS:
        v = values.get(key, _html.escape(str(fields.get(key, ""))))
        rows.append(
            f'<tr><td style="{cell}font-weight:600;">{label}</td>'
            f'<td style="{cell}white-space:pre-wrap;">{v}</td></tr>'
        )
    return (
        '<div dir="rtl" style="font-family:Arial,sans-serif;font-size:14px;">'
        '<table style="border-collapse:collapse;width:100%;max-width:900px;">'
        f'<tr><th colspan="2" style="{cell}text-align:center;font-weight:800;">'
        f"{_TICKET_TITLE}</th></tr>"
        + "".join(rows)
        + "</table></div>"
    )


def write_eml_draft(
    to_addr: str,
    subject: str,
    html_content: str,
    out_dir: str | os.PathLike | None = None,
    *,
    filename: str = "ticket_draft.eml",
) -> Path:
    """S13 email sink, portable path (`adapters/mailer.py:25-38`): write an
    RFC-822 ``.eml`` draft (X-Unsent so mail clients open it editable) with
    the HTML body as the alternative part. Returns the written path."""
    import tempfile

    out = Path(out_dir) if out_dir is not None else Path(tempfile.gettempdir())
    out.mkdir(parents=True, exist_ok=True)
    path = out / filename
    msg = EmailMessage(policy=_default_policy)
    msg["To"] = to_addr
    msg["Subject"] = subject
    msg["X-Unsent"] = "1"
    msg.add_alternative(html_content, subtype="html")
    with open(path, "wb") as fh:
        fh.write(msg.as_bytes())
    return path
