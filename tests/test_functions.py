"""Unit tests for the scalar function library (reference F1-F40 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from printer_etl_hub_spark.functions import (
    bytes_to_text,
    canonicalize_id,
    clamp_pct,
    compute_supply_percent,
    dash_if_blank,
    error_code,
    friendly_color,
    hr_error_flags,
    is_bad_value,
    norm_ws,
    normalize_color,
    pct_with_symbol,
    sanitize_control_chars,
    severity_rank,
    severity_tag_snmp,
    split_postal,
    status_online_offline,
    toner_type_display,
    triage_three,
)
from printer_etl_hub_spark.functions.extract import (
    parse_colorant_oid,
    parse_supplies_oid,
    toner_id,
)
from printer_etl_hub_spark.functions.normalize import safe_bigint


def col_vals(spark, expr, rows, schema="v string"):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr(F.col("v")).alias("out")).collect()]


def test_norm_ws(spark):
    got = col_vals(spark, norm_ws, [("  A   b\t C ",), ("x",), (None,)])
    assert got == ["a b c", "x", None]


def test_canonicalize_id(spark):
    got = col_vals(
        spark, canonicalize_id, [(" 42.0 ",), ("007",), ("ab\ncd",), ("1001",)]
    )
    assert got == ["42", "7", "ab cd", "1001"]


def test_normalize_color(spark):
    got = col_vals(
        spark, normalize_color,
        [("HP Black Toner",), ("k",), ("CYAN ink",), ("weird",), (None,)],
    )
    assert got == ["Black", "Black", "Cyan", None, None]


def test_status_online_offline(spark):
    got = col_vals(
        spark, status_online_offline,
        [("Ready",), ("power DOWN",), ("",), (None,), ("off",), ("on",), ("banana",)],
    )
    assert got == ["online", "offline", "offline", "offline", "offline", "online", "offline"]


def test_dash_if_blank(spark):
    got = col_vals(spark, dash_if_blank, [("",), ("  ",), (None,), ("x",)])
    assert got == ["-", "-", "-", "x"]


def test_sanitize_control_chars(spark):
    got = col_vals(spark, sanitize_control_chars, [("a\x01b\x0bc\tok",)])
    assert got == ["abc\tok"]  # \t (0x09) is legal and kept


def test_split_postal(spark):
    df = spark.createDataFrame([("Herzl 1, Tel Aviv 6100000",), ("no postal here",)], "v string")
    addr, postal = split_postal(F.col("v"))
    got = df.select(addr.alias("a"), postal.alias("p")).collect()
    assert (got[0]["a"], got[0]["p"]) == ("Herzl 1, Tel Aviv", "6100000")
    assert (got[1]["a"], got[1]["p"]) == ("no postal here", None)


def test_safe_bigint(spark):
    got = col_vals(spark, safe_bigint, [("12.0",), ("7",), ("x",), (None,)])
    assert got == [12, 7, None, None]


def test_bytes_to_text(spark):
    got = col_vals(spark, bytes_to_text, [("b'hello'",), ("a\x00b",)])
    assert got == ["hello", "ab"]


def test_is_bad_value(spark):
    got = col_vals(
        spark, is_bad_value,
        [("0.0.0.0",), (" N/A ",), ("10.0.0.1",), (None,), ("-",)],
    )
    assert got == [True, True, False, True, True]


def test_supply_percent(spark):
    df = spark.createDataFrame(
        [(19, "42", "0"), (7, "50", "200"), (7, "-2", "100"), (7, "10", "0"), (19, "150", "0")],
        "unit int, level string, mx string",
    )
    got = [
        r[0]
        for r in df.select(
            compute_supply_percent(F.col("unit"), F.col("level"), F.col("mx")).alias("p")
        ).collect()
    ]
    assert got == [42.0, 25.0, None, None, 100.0]


def test_pct_and_clamp(spark):
    df = spark.createDataFrame([(42,), (None,)], "v int")
    got = [r[0] for r in df.select(pct_with_symbol(F.col("v")).alias("o")).collect()]
    assert got == ["42%", None]
    df2 = spark.createDataFrame([(-5,), (150,), (60,)], "v int")
    got2 = [r[0] for r in df2.select(clamp_pct(F.col("v")).alias("o")).collect()]
    assert got2 == [0, 100, 60]


def test_friendly_color_hebrew(spark):
    got = col_vals(spark, friendly_color, [("טונר שחור",), ("Cyan 123",), ("???",)])
    assert got == ["Black", "Cyan", "Unknown"]


def test_severity_functions(spark):
    df = spark.createDataFrame([(4,), (3,), (2,), (1,)], "v int")
    got = [r[0] for r in df.select(severity_tag_snmp(F.col("v")).alias("o")).collect()]
    assert got == ["critical", "warning", "unknown", "other"]
    got2 = col_vals(spark, triage_three, [("7",), ("4",), ("1",), ("FATAL",), ("warn",), ("meh",)])
    assert got2 == ["critical", "warning", "informational", "critical", "warning", "informational"]
    got3 = col_vals(spark, severity_rank, [("3",), ("99",), ("critical",), ("notice",), ("?",)])
    assert got3 == [3, 9, 9, 2, 0]


def test_hr_error_flags(spark):
    df = spark.createDataFrame([((1 << 4) | (1 << 5) | (1 << 7),), (0,)], "v long")
    got = [r[0] for r in df.select(hr_error_flags(F.col("v")).alias("o")).collect()]
    assert got[0] == ["doorOpen", "jammed", "serviceRequested"]
    assert got[1] == []


def test_oid_parsers(spark):
    df = spark.createDataFrame(
        [("1.3.6.1.2.1.43.11.1.1.9.1.3",), ("1.3.6.1.2.1.43.12.1.1.4.1.2",)], "v string"
    )
    c, i = parse_supplies_oid(F.col("v"))
    m, ci = parse_colorant_oid(F.col("v"))
    rows = df.select(c.alias("c"), i.alias("i"), m.alias("m"), ci.alias("ci")).collect()
    assert (rows[0]["c"], rows[0]["i"]) == (9, 3)
    assert (rows[1]["m"], rows[1]["ci"]) == (1, 2)


def test_code_extractors(spark):
    got = col_vals(spark, error_code, [("Error E2-1234 found",), ("none",)])
    assert got == ["E2-1234", None]
    got2 = col_vals(spark, toner_id, [("use W2040X now",), ("MLT-D111S",), ("nothing",)])
    assert got2 == ["W2040X", "MLT-D111S", None]


def test_toner_type_display(spark):
    df = spark.createDataFrame([(["CF226A", "CF226A", "W2040X"],)], "v array<string>")
    got = [r[0] for r in df.select(toner_type_display(F.col("v")).alias("o")).collect()]
    assert got == ["CF226A, W2040X"]


def test_tolerant_json_field(spark):
    from printer_etl_hub_spark.functions.extract import tolerant_json_field

    df = spark.createDataFrame(
        [
            ('{"status": "ok", "code": 1}',),
            ('{status: "sloppy", code:42}',),   # unquoted keys (F26 fallback)
            ("not json",),
            (None,),
        ],
        "s string",
    )
    out = [
        r[0]
        for r in df.select(
            tolerant_json_field(F.col("s"), "status STRING, code INT", "status")
        ).collect()
    ]
    assert out == ["ok", "sloppy", None, None]


def test_xml_local_name_text(spark):
    from printer_etl_hub_spark.functions.extract import xml_local_name_text

    df = spark.createDataFrame(
        [
            ('<a:Root xmlns:a="urn:x"><a:Severity>Warning</a:Severity></a:Root>',),
            ("<Root><Status>מוכן</Status></Root>",),  # Hebrew text, no namespace
            ("<Root/>",),
        ],
        "xml string",
    )
    out = [
        r[0]
        for r in df.select(
            xml_local_name_text(F.col("xml"), "Severity", "Status")
        ).collect()
    ]
    assert out == ["Warning", "מוכן", None]


def test_strip_html_and_redact_pii(spark):
    from pyspark.sql import functions as F

    from printer_etl_hub_spark.functions.text import redact_pii, strip_html

    df = spark.createDataFrame(
        [
            ('<div a="1"><b>Hi</b> &amp; bye</div>', "a@b.co or 1.2.3.4 call +44 20 7946 0958 now"),
        ],
        "html STRING, pii STRING",
    )
    r = df.select(
        strip_html(F.col("html")).alias("h"), redact_pii(F.col("pii")).alias("p")
    ).first()
    assert r.h == "Hi & bye"
    assert r.p == "<EMAIL> or <IP> call <PHONE> now"

    # redaction order: the email's local part must not be phone-eaten
    r2 = spark.createDataFrame([("mail 12345678901@x.io end",)], "s STRING").select(
        redact_pii(F.col("s")).alias("p")
    ).first()
    assert r2.p == "mail <EMAIL> end"


def test_f31_f34_case_mappings(spark):
    from pyspark.sql import functions as F

    from printer_etl_hub_spark.functions.extract import (
        derive_severity_from_problem,
        normalize_problem_severity,
        short_label,
        status_category_display,
    )

    df = spark.range(1)

    def one(col):
        return df.select(col.alias("v")).first().v

    # F31: fixed map + capitalize fallback
    assert one(status_category_display(F.lit("ready"))) == "Ready"
    assert one(status_category_display(F.lit(" InterventionRequired "))) == "Needs attention"
    assert one(status_category_display(F.lit("mystery"))) == "Mystery"

    # F32: critical beats warning; empty → informational
    assert one(derive_severity_from_problem(F.lit("Paper JAM in tray"))) == "critical"
    assert one(derive_severity_from_problem(F.lit("toner low"))) == "warning"
    assert one(derive_severity_from_problem(F.lit(""))) == "informational"
    assert one(derive_severity_from_problem(F.lit(None).cast("string"))) == "informational"

    # F33: unknown → null/info; Hebrew ready/sleep; not-ready passthrough
    r = one(normalize_problem_severity(F.lit("Unknown state"), F.lit("critical")))
    assert r.problem is None and r.severity == "informational"
    r = one(normalize_problem_severity(F.lit("המדפסת מוכן"), F.lit("warning")))
    assert r.problem == "Ready" and r.severity == "informational"
    r = one(normalize_problem_severity(F.lit("device not ready"), F.lit("warning")))
    assert r.problem == "device not ready" and r.severity == "warning"
    r = one(normalize_problem_severity(F.lit("מצב שינה"), F.lit("warning")))
    assert r.problem == "Sleeping"

    # F34: catalog wins; keyword table; blank → Normal
    assert one(short_label(F.lit("front door is open"), F.lit(None).cast("string"))) == "Door open"
    assert one(short_label(F.lit("imaging unit please replace"), F.lit(None).cast("string"))) == "Replace drum now"
    assert one(short_label(F.lit("anything"), F.lit("From catalog"))) == "From catalog"
    assert one(short_label(F.lit(""), F.lit(None).cast("string"))) == "Normal"


def test_normalize_supply_label(spark):
    """F17 `_normalize_label` (`adapters/brother_toner_web.py:12-24`):
    strip non-letters, uppercase, synonym-map the four colors; unknown
    letter-strings pass through; empty/None → null — then F16 clamp and
    F14 percent format on the matching value column."""
    from printer_etl_hub_spark.functions.extract import (
        clamp_pct,
        normalize_supply_label,
        pct_with_symbol,
    )

    rows = [
        ("BK:", 42), (" k ", 101), ("BLK", -5), ("Black", 7),
        ("cyan*", 55), ("M", 12), ("Yellow!", 0), ("WASTE", 30),
        ("123", 10), (None, 10),
    ]
    df = spark.createDataFrame(rows, "label string, pct int")
    out = df.select(
        normalize_supply_label(F.col("label")).alias("norm"),
        pct_with_symbol(clamp_pct(F.col("pct"))).alias("pct"),
    ).collect()
    got = [(r.norm, r.pct) for r in out]
    assert got == [
        ("BK", "42%"), ("BK", "100%"), ("BK", "0%"), ("BK", "7%"),
        ("C", "55%"), ("M", "12%"), ("Y", "0%"), ("WASTE", "30%"),
        (None, "10%"), (None, "10%"),
    ]
