"""Query plans: the engine's declared query surface.

``REGISTRY`` maps query name → QuerySpec(spark_fn, oracle_sql). Every
SURVEY.md §2 operator is exercised by at least one registry entry (see
COVERAGE.md for the line-by-line mapping); oracle_sql is the DuckDB-
equivalent ANSI SQL the correctness driver diffs against, or None for
ops that aren't SQL-expressible (weaker rows-only check).
"""

from .registry import REGISTRY, QuerySpec  # noqa: F401
