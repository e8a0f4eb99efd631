"""Pipeline lifecycle (reference §3.1): plan build → execute → summarize.

The reference's runner (`core/pipeline.py:67-147`, `cli/command.py:15-94`,
`adapters/script_runner.py:33-84`) natural-sorts step scripts, applies
exclude marks, runs each step in a child process with wall-clock timing,
and rolls results up to an exit code. Here each step is a function over the
shared SparkSession — Catalyst replaces the file-mediated step protocol —
but the orchestration surface (natural order, excludes, per-step
StepResult, roll-up) is kept so an operator of the reference can read runs
the same way. Fault containment comes from Spark's task/stage retry instead
of process isolation; a step exception is captured, not propagated, exactly
like a nonzero child exit code.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class StepResult:
    """Mirror of the reference's StepResult (`adapters/script_runner.py:13-19`)."""

    name: str
    ok: bool
    elapsed_s: float
    skipped: bool = False
    error: str | None = None


def natural_key(name: str) -> tuple:
    """Digit-aware ordering key: ``a2 < a10`` (reference W1,
    `core/pipeline.py:24-35`)."""
    return tuple(
        int(part) if part.isdigit() else part
        for part in re.split(r"(\d+)", name)
        if part != ""
    )


def build_plan(
    steps: dict[str, Callable[[SparkSession], object]],
    excludes: Iterable[str] = (),
) -> list[tuple[str, Callable[[SparkSession], object] | None]]:
    """Natural-sorted plan with exclude marks (excluded steps stay in the
    plan as skips, like `cli/command.py:59-66` — the run report shows them)."""
    ex = set(excludes)
    return [
        (name, None if name in ex else steps[name])
        for name in sorted(steps, key=natural_key)
    ]


def run_pipeline(
    spark: SparkSession,
    steps: dict[str, Callable[[SparkSession], object]],
    excludes: Iterable[str] = (),
) -> list[StepResult]:
    """Execute the plan sequentially with per-step timing; exceptions are
    captured as failed StepResults (`adapters/script_runner.py:50-79`)."""
    results: list[StepResult] = []
    for name, fn in build_plan(steps, excludes):
        if fn is None:
            results.append(StepResult(name, ok=True, elapsed_s=0.0, skipped=True))
            continue
        t0 = time.perf_counter()
        try:
            fn(spark)
            results.append(StepResult(name, True, round(time.perf_counter() - t0, 3)))
        except Exception as exc:  # noqa: BLE001 — step isolation by design
            results.append(
                StepResult(
                    name, False, round(time.perf_counter() - t0, 3), error=str(exc)
                )
            )
    return results


def summarize(results: list[StepResult]) -> bool:
    """Roll-up: every non-skipped step ok (`adapters/script_runner.py:82-84`)."""
    return all(r.ok for r in results)
