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
