"""Degenerate-input sweep: every registry query over an EMPTY corpus.

At 100 TB scale, empty partitions, empty date ranges, and freshly-created
(zero-row) tables are routine; a query that throws on zero rows is a
production outage, not an edge case. Each query must PLAN and EXECUTE over
all-empty tables and return a (possibly empty) result — never raise.

The empty corpus is schema-identical parquet (written from the sf0.001
files with a false predicate) so scans, casts, and timestamp handling all
exercise the real code paths.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from printer_etl_hub_spark.plans import REGISTRY

EMPTY_DIR = "/tmp/peh_empty_corpus"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_dir():
    if not os.path.exists(f"{EMPTY_DIR}/documents.parquet"):
        os.makedirs(EMPTY_DIR, exist_ok=True)
        con = duckdb.connect()
        src = "/root/testdata/sf0.001"
        for t in TABLES:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE 1=0) "
                f"TO '{EMPTY_DIR}/{t}.parquet' (FORMAT PARQUET)"
            )
    return EMPTY_DIR


def test_every_query_survives_an_empty_corpus(spark, empty_dir):
    failures = {}
    for name, spec in REGISTRY.items():
        try:
            n = spec.fn(spark, empty_dir).count()
            assert n >= 0
        except Exception as exc:  # collect all, report once
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert not failures, failures


NULLS_DIR = "/tmp/peh_nulls_corpus"


@pytest.fixture(scope="module")
def nulls_dir():
    """sf0.001 with NULLs injected into every nullable 'content' column:
    odd-id documents lose text, odd-id embeddings lose their vector,
    every third document loses lang, every third event loses value,
    every fifth event loses ts (an unstamped event must never crash a
    time-series plan — r10)."""
    if not os.path.exists(f"{NULLS_DIR}/documents.parquet"):
        os.makedirs(NULLS_DIR, exist_ok=True)
        con = duckdb.connect()
        src = "/root/testdata/sf0.001"
        tweaks = {
            "documents": (
                "SELECT doc_id, CASE WHEN doc_id % 2 = 1 THEN NULL ELSE text END AS text, "
                "CASE WHEN doc_id % 3 = 1 THEN NULL ELSE lang END AS lang, source, n_chars"
            ),
            "embeddings": (
                "SELECT vec_id, CASE WHEN vec_id % 2 = 1 THEN NULL ELSE embedding END AS embedding, label"
            ),
            "events": (
                "SELECT * REPLACE ("
                "CASE WHEN event_id % 3 = 1 THEN NULL ELSE value END AS value, "
                "CASE WHEN event_id % 5 = 1 THEN NULL ELSE ts END AS ts)"
            ),
        }
        for t in TABLES:
            sel = tweaks.get(t, "SELECT *")
            con.execute(
                f"COPY ({sel} FROM '{src}/{t}.parquet') "
                f"TO '{NULLS_DIR}/{t}.parquet' (FORMAT PARQUET)"
            )
    return NULLS_DIR


def test_every_query_survives_null_content(spark, nulls_dir):
    """NULL text/vector/lang/value rows must never crash a query — at
    scale they are a certainty, and a null-intolerant expression (e.g.
    size(NULL) = -1 feeding sequence()) is a corpus-wide job failure.
    Semantics over nulls are each query's business; this sweep only pins
    'plans, executes, returns'."""
    failures = {}
    for name, spec in REGISTRY.items():
        try:
            n = spec.fn(spark, nulls_dir).count()
            assert n >= 0
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert not failures, failures
