"""The .collect() bound sweep (VERDICT r12 #3).

Sixteen driver-side collect sites were justified by comments
("index-sized", "driver-sized") the way BNLJs were once justified by
names. This module applies the count-pin discipline that now covers
BNLJs: every ``.collect()`` in the package must be RUNTIME-bounded —
either a ``.limit(n)`` sits in its receiver chain (the cap is a plan
node, it cannot return more), or the call routes through
``bounded.bounded_collect`` (which caps at ``bound + 1`` inside the
plan and raises past the declared bound). The sweep walks the package
AST, so a NEW unbounded collect — or a new driver-pull spelled
``toPandas``/``toLocalIterator``/``first``/``head``/``take``, none of
which the package uses — fails here before it ships, and the per-file
site counts are pinned so even a bounded addition gets reviewed.

The runtime trip test feeds an oversized frame through the guard: the
bound is enforcement, not documentation.
"""

from __future__ import annotations

import ast
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "printer_etl_hub_spark"

#: Driver-pull methods the sweep polices. ``collect`` is the only one
#: the package uses; the rest are spellings a future site could dodge
#: through.
PULL_METHODS = {"collect", "toPandas", "toLocalIterator", "first", "head", "take"}

#: Pinned manifest: file → (raw limit-chained .collect() calls,
#: bounded_collect call sites). A new driver pull ANYWHERE — bounded or
#: not — changes a count and fails the pin until reviewed here.
MANIFEST = {
    "bounded.py": (1, 0),            # the guard's own capped fetch
    # convergence probe + the r14 union-find-seed initial-label probe
    # (both 1-row scalar aggs)
    "operators/components.py": (0, 2),
    "operators/dedup.py": (0, 1),        # semantic_dedup centroid fetch
    #   (k rows, k is the caller's knob; feeds the literal-argmin path —
    #   r13 optimization #2, reviewed)
    "operators/similarity.py": (4, 6),   # 4 seed/limit fetches; psi,
    #   candidate draw, cell weights, farthest probe, Lloyd update,
    #   PQ codebook update
    "operators/upsert.py": (1, 0),       # SCD2 dup probe, limit(1)
    "plans/convert.py": (0, 1),          # workbook render (sheet cap)
    "plans/ticket.py": (1, 0),           # point lookup, limit(max+1)
    "sources/json_store.py": (0, 1),     # fleet JSON export (sheet cap)
    "streaming/corpus.py": (0, 1),       # late-total probe (1 row)
}


def _limit_in_chain(call: ast.Call) -> bool:
    """True when a .limit(...) call appears in the receiver chain of a
    driver-pull call — the plan itself caps the transfer."""
    n = call.func.value  # type: ignore[attr-defined]
    while True:
        if isinstance(n, ast.Call):
            f = n.func
            if isinstance(f, ast.Attribute):
                if f.attr == "limit":
                    return True
                n = f.value
            else:
                return False
        elif isinstance(n, ast.Attribute):
            n = n.value
        else:
            return False


def _scan(path: pathlib.Path):
    tree = ast.parse(path.read_text())
    pulls, bounded_calls, violations = 0, 0, []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        if isinstance(f, ast.Name) and f.id == "bounded_collect":
            bounded_calls += 1
        elif isinstance(f, ast.Attribute) and f.attr in PULL_METHODS:
            # F.first(...) is the COLUMN aggregate, not a DataFrame pull
            if isinstance(f.value, ast.Name) and f.value.id == "F":
                continue
            pulls += 1
            if not _limit_in_chain(node):
                violations.append(f"{path.name}:{node.lineno} .{f.attr}()")
    return pulls, bounded_calls, violations


def test_every_driver_pull_is_runtime_bounded():
    got, all_violations = {}, []
    for path in sorted(PKG.rglob("*.py")):
        pulls, bounded_calls, violations = _scan(path)
        all_violations.extend(violations)
        if pulls or bounded_calls:
            got[str(path.relative_to(PKG))] = (pulls, bounded_calls)
    assert not all_violations, (
        "unbounded driver pulls (no .limit in chain — route through "
        f"bounded.bounded_collect with a documented bound): {all_violations}"
    )
    assert got == MANIFEST, (
        "driver-pull sites changed — review each new/removed site and "
        f"re-pin the manifest.\n got: {got}\nwant: {MANIFEST}"
    )


def test_bounded_collect_trips_on_oversized_frame(spark):
    from printer_etl_hub_spark.bounded import bounded_collect

    df = spark.range(100)
    # within bound: returns everything
    assert len(bounded_collect(df, 100, "test")) == 100
    with pytest.raises(ValueError, match="declared bound of 99"):
        bounded_collect(df, 99, "test")
    # the cap rides in the plan: an over-bound frame must not transfer
    # itself to the driver before the raise — bound+1 rows at most
    big = spark.range(10_000_000)
    with pytest.raises(ValueError, match="declared bound of 10"):
        bounded_collect(big, 10, "test")


def test_bounded_collect_preserves_sort(spark):
    from pyspark.sql import functions as F

    from printer_etl_hub_spark.bounded import bounded_collect

    df = spark.range(50).orderBy(F.desc("id"))
    rows = bounded_collect(df, 50, "test")
    assert [r.id for r in rows] == list(range(49, -1, -1))
