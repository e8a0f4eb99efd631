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


def _write_date_workbook(path, date1904=False):
    """Hand-built workbook exercising date styles: cellXfs 0 = general,
    1 = built-in date (numFmtId 14), 2 = custom date code (165),
    3 = custom NON-date code (166, quoted 'd' and [Red] must not trip
    the heuristic)."""
    import zipfile

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    pr = '<workbookPr date1904="1"/>' if date1904 else ""
    workbook = (
        f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships">{pr}'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    styles = (
        f'<styleSheet xmlns="{ns}">'
        '<numFmts count="2">'
        '<numFmt numFmtId="165" formatCode="yyyy\\-mm\\-dd hh:mm"/>'
        '<numFmt numFmtId="166" formatCode="[Red]0.00&quot;d&quot;"/>'
        "</numFmts>"
        '<cellXfs count="4">'
        '<xf numFmtId="0"/><xf numFmtId="14"/>'
        '<xf numFmtId="165"/><xf numFmtId="166"/>'
        "</cellXfs></styleSheet>"
    )
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1">'
        '<c r="A1" s="1"><v>45170</v></c>'          # 2023-09-01 (1900 system)
        '<c r="B1" s="2"><v>45170.5</v></c>'        # + 12:00 (custom date fmt)
        '<c r="C1" s="3"><v>45170</v></c>'          # non-date custom fmt
        '<c r="D1"><v>45170</v></c>'                # unstyled number
        "</row></sheetData></worksheet>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/styles.xml", styles)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def test_read_xlsx_date_cells(tmp_path):
    """Date-styled serials convert through the workbook epoch to
    date/datetime; non-date styles and unstyled numbers stay raw."""
    from datetime import date, datetime

    from printer_etl_hub_spark.sources.xlsx import read_xlsx_rows

    p = str(tmp_path / "dates.xlsx")
    _write_date_workbook(p)
    [row] = read_xlsx_rows(p)
    assert row == [
        date(2023, 9, 1),
        datetime(2023, 9, 1, 12, 0),
        45170,
        45170,
    ]
    # 1904 system shifts the epoch: serial 100 = 1904-04-10.
    p4 = str(tmp_path / "dates1904.xlsx")
    _write_date_workbook(p4, date1904=True)
    [row4] = read_xlsx_rows(p4)
    assert row4[0] == date(1904, 1, 1).fromordinal(
        date(1904, 1, 1).toordinal() + 45170
    )


def test_xlsx_date_cells_surface_as_iso_in_frames_and_writeback(spark, tmp_path):
    """F35 routing: date cells become ISO-8601 strings in the Spark frame
    and in a workbook written back out (round-trip)."""
    from datetime import date, datetime

    from printer_etl_hub_spark.sources.tabular import read_sheet
    from printer_etl_hub_spark.sources.xlsx import read_xlsx_rows, write_xlsx

    # Frame path: a sheet whose data row holds date objects.
    p = str(tmp_path / "d.xlsx")
    write_xlsx(p, ["id", "when"], [["1", datetime(2026, 8, 14, 9, 30)]])
    df = read_sheet(spark, p, fmt="xlsx")
    assert df.collect()[0].when == "2026-08-14T09:30:00"

    # Write-back round-trip: datetime/date values land as ISO strings.
    p2 = str(tmp_path / "rt.xlsx")
    write_xlsx(p2, ["a", "b"], [[date(2026, 1, 2), datetime(2026, 1, 2, 3, 4, 5)]])
    rows = read_xlsx_rows(p2)
    assert rows[1] == ["2026-01-02", "2026-01-02T03:04:05"]


def test_elapsed_duration_formats_stay_numeric(tmp_path):
    """[h]:mm:ss-style ELAPSED formats are durations, not dates: the cell
    must keep its raw serial number (round-4 review fix)."""
    import zipfile

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    workbook = (
        f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    styles = (
        f'<styleSheet xmlns="{ns}">'
        '<numFmts count="1"><numFmt numFmtId="165" formatCode="[h]:mm:ss"/></numFmts>'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="165"/></cellXfs>'
        "</styleSheet>"
    )
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" s="1"><v>30.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    p = str(tmp_path / "dur.xlsx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/styles.xml", styles)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    from printer_etl_hub_spark.sources.xlsx import read_xlsx_rows

    assert read_xlsx_rows(p) == [[30.5]]
