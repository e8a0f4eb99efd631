"""Driver-contract guard: __spark_entry__ must keep its exact shape —
entry() runs the flagship query, queries()/oracle_sql() expose the
registry with the gated window fully oracled."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs_and_is_stable(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    # flagship = TPC-H Q1 shape: stable column set
    assert set(df.columns) >= {"l_returnflag", "l_linestatus"}


def test_queries_and_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 80
    assert set(o) <= set(q)
    window = list(q)[:50]
    assert all(name in o for name in window), "gated window must be fully oracled"
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())
