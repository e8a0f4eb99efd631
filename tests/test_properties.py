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


#: Java regex \s (Spark) and RE2 \s (DuckDB) are the ASCII class below.
#: Python's \s and str.strip() additionally count \x1c-\x1f as whitespace —
#: the engine contract is Spark==DuckDB, so the oracle pins the ASCII class.
WS = r"[ \t\n\x0b\f\r]"


def _re_strip(s):
    return re.sub(f"^{WS}+|{WS}+$", "", s)


def py_norm_ws(s):
    return re.sub(f"{WS}+", " ", _re_strip(s)).lower()


def _engine_float(s):
    """float() pinned to the engines' numeric-literal grammar: Python parses
    Unicode digits and '1_0'; Spark/DuckDB casts don't."""
    if not s.isascii() or "_" in s:
        raise ValueError(s)
    return float(s)


def py_canonicalize_id(s):
    try:
        f = _engine_float(s)
        if f in (float("inf"), float("-inf")) or f != f:
            raise ValueError
        return str(int(f))
    except (ValueError, OverflowError):
        return re.sub(r"[\n\r]+", " ", _re_strip(s))


def py_dash_if_blank(s):
    t = _re_strip(s)
    return t if t else "-"


def py_norm_text(s):
    t = re.sub(f"{WS}+", " ", _re_strip(s))
    return t or None


def py_safe_bigint(s):
    try:
        v = int(_engine_float(s))
    except (ValueError, OverflowError):
        return None
    # bigint range: the engine's try_cast chain nulls outside int64
    return v if -(2**63) <= v < 2**63 else None


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
