"""Stdlib XLSX carrier: reader/writer round-trips feeding the S1-S3 header
semantics and the S11 report-sink flow (no openpyxl in this container)."""

from __future__ import annotations

import pytest

from printer_etl_hub_spark.sources.tabular import (
    EMPLOYEE_SPEC,
    read_sheet,
    read_sheet_detect_header,
)
from printer_etl_hub_spark.sources.xlsx import read_xlsx_rows, write_xlsx


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        ["id", "שם", "pct", "ok"],
        [[1, "Alice", 42.5, True], [2, "בועז", 7, False], [3, None, None, None]],
    )
    rows = read_xlsx_rows(p)
    assert rows[0] == ["id", "שם", "pct", "ok"]
    assert rows[1] == [1, "Alice", 42.5, True]
    assert rows[2] == [2, "בועז", 7, False]
    assert rows[3] == [3, None, None, None]


def test_xlsx_escaping_and_gaps(tmp_path):
    p = str(tmp_path / "esc.xlsx")
    write_xlsx(p, ["a<b", 'q"&'], [["<tag>", None], [None, "x&y"]])
    rows = read_xlsx_rows(p)
    assert rows[0] == ["a<b", 'q"&']
    assert rows[1] == ["<tag>", None]
    assert rows[2] == [None, "x&y"]


def test_read_sheet_xlsx_spec(spark, tmp_path):
    p = str(tmp_path / "emp.xlsx")
    write_xlsx(
        p,
        ["Employee ID", "שם", "Phone Number"],
        [[1, "Alice", 555], [None, None, None], [2, "בועז", 556]],
    )
    df = read_sheet(spark, p, EMPLOYEE_SPEC, fmt="xlsx")
    rows = sorted((r.id, r.name, r.phone) for r in df.collect())
    assert rows == [("1", "Alice", "555"), ("2", "בועז", "556")]


def test_read_sheet_xlsx_inferred_dedup(spark, tmp_path):
    p = str(tmp_path / "loc.xlsx")
    write_xlsx(p, ["addr", "addr", "note"], [["A", "B", None], ["C", "D", "x"]])
    df = read_sheet(spark, p, None, fmt="xlsx")
    assert df.columns == ["addr", "addr_2", "note"]


def test_detect_header_xlsx_title_rows(spark, tmp_path):
    p = str(tmp_path / "report.xlsx")
    write_xlsx(
        p,
        ["Quarterly fleet report"],  # banner row becomes "row 0"
        [
            ["generated", "2026-08-13"],
            ["ID", "Status", "Black"],
            [1, "online", "42%"],
            [2, "offline", "7%"],
        ],
    )
    df = read_sheet_detect_header(spark, p, fmt="xlsx")
    assert df.columns[:3] == ["ID", "Status", "Black"]
    got = sorted((r.ID, r.Status, r.Black) for r in df.collect())
    assert got == [("1", "online", "42%"), ("2", "offline", "7%")]
    bad = str(tmp_path / "bad.xlsx")
    write_xlsx(bad, ["just", "data"], [[1, 2]])
    with pytest.raises(ValueError, match="no header row"):
        read_sheet_detect_header(spark, bad, fmt="xlsx")


def test_s11_merge_to_workbook_flow(spark, tmp_path):
    """End-to-end S11 shape: workbook scan → MERGE upsert → workbook write
    → re-read shows the updated metric columns."""
    from pyspark.sql import functions as F

    from printer_etl_hub_spark.operators.upsert import merge_upsert

    src = str(tmp_path / "inv.xlsx")
    write_xlsx(
        src,
        ["ID", "Status", "Black"],
        [[1, "offline", None], [2, "offline", "7%"]],
    )
    target = read_sheet(spark, src, None, fmt="xlsx", drop_all_null=False)
    updates = spark.createDataFrame(
        [("1", "online", "42%")], "ID string, Status string, Black string"
    )
    merged = merge_upsert(target, updates, "ID", ["Status", "Black"])
    out_rows = [
        [r["ID"], r["Status"], r["Black"]]
        for r in merged.orderBy(F.col("ID")).collect()
    ]
    dst = str(tmp_path / "out.xlsx")
    write_xlsx(dst, ["ID", "Status", "Black"], out_rows)
    back = {r[0]: r for r in read_xlsx_rows(dst)[1:]}
    assert back["1"] == ["1", "online", "42%"]
    assert back["2"] == ["2", "offline", "7%"]


def test_xlsx_roundtrip_property():
    """Property: write→read is identity for XML-representable cell values
    (text incl. Hebrew/CJK/emoji, ints, floats, bools, None gaps)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # XML 1.0 valid text: no C0 controls except \t\n\r, no surrogates.
    xml_text = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),
            blacklist_characters="".join(
                chr(c) for c in range(0x20) if c not in (0x09, 0x0A)
            )
            + "\r",  # \r normalizes to \n in XML parsing — exclude
        ),
        max_size=40,
    )
    cell = st.one_of(
        st.none(),
        xml_text,
        st.integers(min_value=-(10**12), max_value=10**12),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.booleans(),
    )

    @settings(max_examples=30, deadline=None)
    @given(
        headers=st.lists(xml_text.filter(lambda s: s.strip()), min_size=1, max_size=5),
        rows=st.lists(st.lists(cell, min_size=5, max_size=5), max_size=6),
    )
    def roundtrip(headers, rows):
        import tempfile

        headers = (headers + ["h2", "h3", "h4", "h5"])[:5]
        with tempfile.TemporaryDirectory() as d:
            p = f"{d}/prop.xlsx"
            write_xlsx(p, headers, rows)
            got = read_xlsx_rows(p)
        assert got[0] == list(headers)
        for want, have in zip(rows, got[1:]):
            for w, h in zip(want, have):
                if isinstance(w, float) and w.is_integer():
                    # numeric cells store the repr; integral floats read
                    # back as ints (worksheet numbers carry no int/float
                    # distinction)
                    assert h == int(w)
                else:
                    assert h == w
        # trailing all-None rows may collapse (no cells written) — only
        # prefix equality is guaranteed, matching worksheet semantics
        for r in rows[max(len(got) - 1, 0):]:
            assert all(v is None for v in r)

    roundtrip()


def test_write_xlsx_quotes_in_sheet_name(tmp_path):
    """A double quote in the sheet name lands in an XML attribute — must
    escape, not corrupt the workbook."""
    p = str(tmp_path / "q.xlsx")
    write_xlsx(p, ["a"], [[1]], sheet_name='My "Q1" <Sheet> & Co')
    assert read_xlsx_rows(p) == [["a"], [1]]
    assert read_xlsx_rows(p, 'My "Q1" <Sheet> & Co') == [["a"], [1]]
