"""The engine's declared query surface: name → (spark_fn, oracle_sql)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .relational import RELATIONAL_QUERIES
from .textops import TEXT_QUERIES
from .tpch_pack import TPCH_PACK_QUERIES


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: str | None


REGISTRY: dict[str, QuerySpec] = {
    name: QuerySpec(fn, sql)
    for name, (fn, sql) in {
        **RELATIONAL_QUERIES,
        **TEXT_QUERIES,
        **TPCH_PACK_QUERIES,
    }.items()
}
