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


# ---------------------------------------------------------------------------
# Tabular header resolution (S1-S3) — pure-driver properties
# ---------------------------------------------------------------------------
def test_resolve_headers_noise_invariance():
    """Any case/whitespace noise on spec'd headers still resolves every
    logical column, injectively, regardless of column order."""
    import itertools
    import random

    from printer_etl_hub_spark.sources.tabular import EMPLOYEE_SPEC, resolve_headers

    rng = random.Random(7)
    base = ["Employee ID", "שם", "Phone Number"]

    def noisy(h: str) -> str:
        out = "  " + h.upper() + " "
        return out.replace(" ", "  ") if rng.random() < 0.5 else out

    for perm in itertools.permutations(base):
        actual = [noisy(h) for h in perm]
        m = resolve_headers(actual, EMPLOYEE_SPEC)
        assert set(m) == set(EMPLOYEE_SPEC)
        assert len(set(m.values())) == len(m)  # injective
        assert all(v in actual for v in m.values())


def test_dedup_headers_unique_and_prefixed():
    import random

    from printer_etl_hub_spark.sources.tabular import dedup_headers

    rng = random.Random(11)
    for _ in range(50):
        headers = [rng.choice("abc") for _ in range(rng.randint(1, 12))]
        out = dedup_headers(headers)
        assert len(set(out)) == len(out)
        assert all(o == h or o.startswith(h + "_") for h, o in zip(headers, out))
        # first occurrence keeps its bare name
        for name in set(headers):
            assert out[headers.index(name)] == name


def test_redact_pii_leaves_no_pii(spark):
    """After redaction, no email/IPv4 pattern survives in any adversarial
    composition (PII at string edges, back-to-back, inside noise)."""
    from printer_etl_hub_spark.functions.text import EMAIL_RE, IPV4_RE, redact_pii

    samples = [
        "a@b.co",
        "x a@b.co y c.d@e.org z",
        "10.0.0.1",
        "edge@case.io 255.255.255.255",
        "a@b.co10.0.0.1+15550000000",
        "text with no pii at all",
        "tricky @ not-an-email 999.999.999.999",  # dotted quad still matches shape
        "שלום a@b.co עולם",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s STRING")
    out = [r.p for r in df.select(redact_pii(F.col("s")).alias("p")).collect()]
    for s in out:
        assert not re.search(EMAIL_RE, s), s
        assert not re.search(IPV4_RE, s), s


def test_zorder_key_bounds(spark):
    """Z keys stay within [0, 2^(k*bits)) and are non-constant on
    non-constant input."""
    from printer_etl_hub_spark.sources.layout import zorder_key
    from printer_etl_hub_spark.tables import load_tables

    from conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE)["events"].select("user_id", "value")
    z = zorder_key(ev, ["user_id", "value"], bits=6)
    stats = ev.select(z.alias("z")).agg(
        F.min("z").alias("lo"), F.max("z").alias("hi"), F.countDistinct("z").alias("n")
    ).first()
    assert 0 <= stats.lo <= stats.hi < (1 << 12)
    assert stats.n > 10


def test_connected_components_random_graphs_vs_union_find(spark):
    """Random graphs (varying density, incl. long paths + stars) must match
    a driver-side union-find oracle exactly."""
    import random

    from printer_etl_hub_spark.operators.components import connected_components

    def uf_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = random.Random(42)
    cases = []
    for trial in range(3):
        n = 40
        m = rng.randint(n // 2, 2 * n)
        cases.append([(rng.randrange(n), rng.randrange(n)) for _ in range(m)])
    cases.append([(i, i + 1) for i in range(30)])          # path
    cases.append([(0, i) for i in range(1, 30)])           # star
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "a_id BIGINT, b_id BIGINT")
        got = {
            (r.node, r.component)
            for r in connected_components(df, "a_id", "b_id").collect()
        }
        want = set(uf_components(edges).items())
        assert got == want
