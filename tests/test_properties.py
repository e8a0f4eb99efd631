"""Property-style differential tests: normalization Columns vs pure-Python
oracles over adversarial inputs (Hebrew, control chars, numerics, blanks) —
SURVEY.md §5.4. One Spark job per function (vectorized), not per example.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from printer_etl_hub_spark.functions.normalize import (
    canonicalize_id,
    dash_if_blank,
    norm_text,
    norm_ws,
    safe_bigint,
)

CASES = [
    "",
    " ",
    "  a  B\tc ",
    "שלום  עולם",
    "42",
    " 42.0 ",
    "42.9",
    "-17",
    "1e3",
    "abc\ndef\rghi",
    "\x01ctl\x1f",
    "nan",
    "inf",
    "  -  ",
    "0007",
    "12.0.1",
    "٣٤",  # arabic-indic digits
    "x" * 200,
    "Mixed עברית and English  123 ",
]


def py_norm_ws(s):
    return re.sub(r"\s+", " ", s.strip()).lower()


def py_canonicalize_id(s):
    try:
        f = float(s)
        if f in (float("inf"), float("-inf")) or f != f:
            raise ValueError
        return str(int(f))
    except (ValueError, OverflowError):
        return re.sub(r"[\n\r]+", " ", s.strip())


def py_dash_if_blank(s):
    t = s.strip()
    return t if t else "-"


def py_norm_text(s):
    t = re.sub(r"\s+", " ", s.strip())
    return t or None


def py_safe_bigint(s):
    try:
        return int(float(s))
    except (ValueError, OverflowError):
        return None


def _run(spark, col_fn):
    df = spark.createDataFrame([(c,) for c in CASES], "v string")
    return [r[0] for r in df.select(col_fn(F.col("v")).alias("o")).collect()]


def test_norm_ws_matches_python(spark):
    assert _run(spark, norm_ws) == [py_norm_ws(c) for c in CASES]


def test_canonicalize_id_matches_python(spark):
    got = _run(spark, canonicalize_id)
    want = [py_canonicalize_id(c) for c in CASES]
    for c, g, w in zip(CASES, got, want):
        assert g == w, f"canonicalize_id({c!r}): spark={g!r} python={w!r}"


def test_dash_if_blank_matches_python(spark):
    assert _run(spark, dash_if_blank) == [py_dash_if_blank(c) for c in CASES]


def test_norm_text_matches_python(spark):
    assert _run(spark, norm_text) == [py_norm_text(c) for c in CASES]


def test_safe_bigint_matches_python(spark):
    got = _run(spark, safe_bigint)
    want = [py_safe_bigint(c) for c in CASES]
    for c, g, w in zip(CASES, got, want):
        assert g == w, f"safe_bigint({c!r}): spark={g!r} python={w!r}"
