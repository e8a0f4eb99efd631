"""Driver-side edges: ticket render (F39), .eml draft sink (S13),
draft→prod promotion (S14), str2bool (F40)."""

from __future__ import annotations

import email
from email import policy

import pytest

from printer_etl_hub_spark.edges import (
    make_ticket_subject,
    promote_draft,
    render_ticket_html,
    str2bool,
    write_eml_draft,
)

FIELDS = {
    "group": "Branches_Grouped",
    "branch_id": "42",
    "customer": "סניף מרכז",
    "serial": "X<&>9",
    "model": "LaserJet 400",
    "address": "הרצל 1\nתל אביב",
    "contact": "דנה",
    "phone": "050-0000000",
    "items": [{"color": "Black", "qty": 2}, {"color": "Cyan", "qty": 1}],
}


def test_subject_parts_and_branch_suffix():
    assert make_ticket_subject(FIELDS) == "הזמנת טונרים - סניף מרכז | LaserJet 400 [42]"
    company = dict(FIELDS, group="Company_Grouped")
    assert not make_ticket_subject(company).endswith("[42]")
    assert make_ticket_subject({}) == "הזמנת טונרים"


def test_render_escapes_and_folds_items():
    html_out = render_ticket_html(FIELDS)
    assert 'dir="rtl"' in html_out
    assert "X&lt;&amp;&gt;9" in html_out           # escaped serial
    assert "Black × 2, Cyan × 1" in html_out       # multi-item fold
    assert ">3<" in html_out                       # summed qty
    one = dict(FIELDS, items=[{"color": "Black", "qty": 5}])
    h1 = render_ticket_html(one)
    assert ">Black<" in h1 and ">5<" in h1


def test_eml_draft_roundtrip(tmp_path):
    p = write_eml_draft(
        "orders@example.invalid",
        make_ticket_subject(FIELDS),
        render_ticket_html(FIELDS),
        tmp_path,
    )
    msg = email.message_from_bytes(p.read_bytes(), policy=policy.default)
    assert msg["To"] == "orders@example.invalid"
    assert msg["X-Unsent"] == "1"
    body = msg.get_body(preferencelist=("html",)).get_content()
    assert "Black × 2" in body and 'dir="rtl"' in body


def test_promote_draft(tmp_path):
    draft = tmp_path / "draft" / "report.csv"
    draft.parent.mkdir()
    draft.write_text("a,b\n1,2\n")
    prod = tmp_path / "prod" / "report.csv"
    promote_draft(draft, prod)
    assert prod.read_text() == "a,b\n1,2\n"
    promote_draft(prod, prod)  # self-promotion is a no-op
    assert prod.read_text() == "a,b\n1,2\n"


def test_str2bool():
    assert all(str2bool(s) for s in ("1", "true", "T", "YES", "y", "on"))
    assert not any(str2bool(s) for s in ("0", "false", "F", "no", "N", "off"))
    with pytest.raises(ValueError):
        str2bool("maybe")
