"""Cross-engine hash-primitive pinning.

The dedup/similarity oracle gates rest on ONE invariant: every hash the
Spark plans compute is bit-identical in DuckDB. A divergence here can stay
invisible at small SF (exact near-dups have identical input sets, so they
collide under ANY self-consistent hash — only borderline pairs expose it;
this is how the transform index-lambda seed bug slipped past the sf0.01
gate). These tests pin the primitives directly on adversarial strings.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from printer_etl_hub_spark.operators.dedup import _md5_60bit

STRINGS = [
    "",
    "a",
    "0:table stream merge",
    "11:שלום עולם",
    "seed:with|pipe and 'quote'",
    "x" * 500,
    "ümlaut Ünïcode",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_md5_60bit_matches_duckdb(spark, duck):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r[0] for r in df.select(_md5_60bit(F.col("s"))).collect()]
    want = [
        duck.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        for s in STRINGS
    ]
    assert got == want


def test_minhash_component_matches_duckdb(spark, duck):
    """One full signature component over a shingle list, per seed: Spark's
    array_min(transform(...)) vs DuckDB's list_min(list_transform(...))."""
    shingles = ["table stream merge", "fast spark agg", "batch part spark"]
    df = spark.createDataFrame([(shingles,)], "sh array<string>")
    for seed in (0, 1, 11):
        prefix = f"{seed}:"
        got = df.select(
            F.array_min(
                F.transform("sh", lambda s: _md5_60bit(F.concat(F.lit(prefix), s)))
            )
        ).collect()[0][0]
        want = duck.execute(
            "SELECT list_min(list_transform(?, "
            f"s -> CAST(('0x' || substr(md5('{prefix}' || s), 1, 15)) AS BIGINT)))",
            [shingles],
        ).fetchone()[0]
        assert got == want, f"seed {seed}: spark={got} duck={want}"


def test_simhash_token_hash_matches_duckdb(spark, duck):
    """The 16-bit token hash behind SimHash (first 4 md5 hex digits)."""
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [
        r[0]
        for r in df.select(
            F.conv(F.substring(F.md5("s"), 1, 4), 16, 10).cast("int")
        ).collect()
    ]
    want = [
        duck.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 4)) AS INTEGER)", [s]
        ).fetchone()[0]
        for s in STRINGS
    ]
    assert got == want


#: Scripts that lower/trim/split/md5 IDENTICALLY in Spark and DuckDB —
#: the portability envelope of every text-keyed oracle gate.
PORTABLE_TEXTS = [
    "שָׁלוֹם עוֹלָם printer דוח",          # Hebrew incl. niqqud
    "日本語 テスト 中文 文档",                 # CJK
    "emoji \U0001F600 mixed ascii",
    "café naïve résumé ümlaut",
    "STRASSE ß GROSS",                     # U+00DF stays ß under lower()
    "MiXeD Case   runs\tof whitespace",
]

#: Known cross-engine CASE-MAPPING divergences: Spark lowercases with full
#: ICU rules (dotted İ → i + combining dot; word-final Σ → ς), DuckDB with
#: simple 1:1 folding (İ → i; Σ → σ everywhere). NOT an engine bug — both
#: are defensible Unicode behaviors — but corpora containing these code
#: points will NOT oracle-match on text-derived keys. Pinned so an engine
#: upgrade that silently changes either side is caught.
DIVERGENT_TEXTS = ["İstanbul", "ΣΙΣΥΦΟΣ"]


def test_text_digest_pipeline_portable_scripts(spark, duck):
    """The full q23-style content digest (md5 over lower/trim) and the
    tokenizer length must agree bit-for-bit across engines on every
    portable script family."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(PORTABLE_TEXTS)], "i int, s string"
    )
    got = {
        r.i: (r.dig, r.n)
        for r in df.select(
            "i",
            F.md5(F.lower(F.trim("s"))).alias("dig"),
            F.size(F.split(F.trim(F.lower("s")), r"\s+")).alias("n"),
        ).collect()
    }
    for i, s in enumerate(PORTABLE_TEXTS):
        dig, n = duck.execute(
            r"SELECT md5(lower(trim(?))), len(regexp_split_to_array(trim(lower(?)), '\s+'))",
            [s, s],
        ).fetchone()
        assert got[i] == (dig, n), (s, got[i], (dig, n))


def test_known_case_mapping_divergences_still_diverge(spark, duck):
    """İ and final Σ lower() differently in Spark (full ICU) vs DuckDB
    (simple folding). If either engine changes this, text-keyed oracles
    must be re-audited — so the divergence itself is the pinned fact."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(DIVERGENT_TEXTS)], "i int, s string"
    )
    got = {r.i: r.lo for r in df.select("i", F.lower("s").alias("lo")).collect()}
    for i, s in enumerate(DIVERGENT_TEXTS):
        duck_lo = duck.execute("SELECT lower(?)", [s]).fetchone()[0]
        assert got[i] != duck_lo, (
            f"{s!r}: engines now AGREE ({got[i]!r}) — portability envelope "
            f"widened; update PORTABLE_TEXTS and re-audit text-keyed oracles"
        )
