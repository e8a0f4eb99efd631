"""Schema-agnostic JSON harvest (reference F27/F28) on the VARIANT type.

The reference walks arbitrarily-nested JSON payloads collecting values whose
keys match substring families (`adapters/ews_alerts.py:47-79` severity/code/
description; `adapters/toner_type_web.py:28-53` toner/supply keys). SURVEY
§2.6 maps the schema-unknown case to Spark 4's VARIANT: ``parse_json`` once,
then a bounded ladder of ``variant_explode`` lateral joins — the walk is
data-driven (keys are discovered, not declared) and stays fully JVM-side;
no Python walker UDF.

Scale: VARIANT stores a parsed binary form, so each level re-reads the
already-parsed value (no JSON re-parse per level). The ladder is a narrow
per-row pipeline — no shuffle at any depth.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_container(sch: Column) -> Column:
    return sch.like("OBJECT<%") | sch.like("ARRAY<%")


def harvest_json(
    df: DataFrame,
    payload_col: str,
    id_cols: tuple[str, ...] = ("id",),
    *,
    max_depth: int = 4,
    key_substrings: tuple[str, ...] | None = None,
    persist_levels: bool = False,
) -> DataFrame:
    """Flatten every leaf of a JSON payload to ``(ids…, path, vtype, val)``.

    - ``path``: dotted object keys with ``[i]`` array indices
      (e.g. ``meta.alerts[1].severity``);
    - ``vtype``: ``schema_of_variant`` of the leaf (STRING / BIGINT / …);
    - ``val``: the leaf rendered as a string;
    - ``key_substrings``: F27's key-family filter — keep only leaves whose
      final key contains any of the substrings (case-insensitive).
    """
    spark = df.sparkSession
    frontier = df.select(
        *id_cols,
        F.parse_json(F.col(payload_col)).alias("_hv"),
        F.lit("").alias("_hpath"),
    )
    leaf_frames: list[DataFrame] = []
    for _ in range(max_depth):
        exploded = frontier.lateralJoin(spark.tvf.variant_explode(F.col("_hv").outer()))
        child_path = (
            F.when(
                F.col("key").isNotNull(),
                F.when(F.col("_hpath") == "", F.col("key")).otherwise(
                    F.concat(F.col("_hpath"), F.lit("."), F.col("key"))
                ),
            )
            .otherwise(
                F.concat(F.col("_hpath"), F.lit("["), F.col("pos").cast("string"), F.lit("]"))
            )
        )
        children = exploded.select(
            *id_cols,
            F.col("value").alias("_hv"),
            child_path.alias("_hpath"),
            F.coalesce(F.col("key"), F.lit("")).alias("_hkey"),
        )
        if persist_levels:
            # each level feeds TWO consumers (its leaves + the next
            # frontier); without the persist the final union re-derives
            # every ancestor explode per leaf frame — O(depth²) re-parses
            from pyspark import StorageLevel

            children = children.persist(StorageLevel.MEMORY_AND_DISK)
        sch = F.schema_of_variant(F.col("_hv"))
        leaf_frames.append(
            children.filter(~_is_container(sch)).select(
                *id_cols,
                F.col("_hpath").alias("path"),
                sch.alias("vtype"),
                F.col("_hv").cast("string").alias("val"),
                F.col("_hkey").alias("_leaf_key"),
            )
        )
        frontier = children.filter(_is_container(sch)).drop("_hkey")
    out = reduce(lambda a, b: a.unionByName(b), leaf_frames)
    if key_substrings:
        key_lc = F.lower(F.col("_leaf_key"))
        cond = reduce(
            lambda a, b: a | b, [key_lc.contains(s.lower()) for s in key_substrings]
        )
        out = out.filter(cond)
    return out.drop("_leaf_key")
