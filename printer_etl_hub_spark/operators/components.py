"""Connected components for duplicate-cluster labeling.

Near-dup detectors (MinHash-LSH, n-gram Jaccard, SimHash — operators/
dedup.py) emit PAIRS; a training-data pipeline needs per-document CLUSTER
labels ("keep one doc per component"). This is min-label propagation over
the pair graph, expressed as iterative DataFrame joins with a driver-side
convergence check.

Scale: each iteration is one shuffle join on node id (partial-agg min
messages) — O(diameter) iterations. Near-dup components are
cliques/short chains (diameter ≤ ~3), so propagation converges in 2-4
rounds; for general graphs with long chains the O(log n) large-star/
small-star variant (Kiveris et al., "Connected Components in MapReduce")
would replace the message step, same join primitives. Frames are persisted
per round and released as soon as the next round materializes; the
convergence probe is a LIMIT 1 existence check, not a full count.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Label every node of the pair graph with its component's minimum id.

    Returns ``(node, component)`` for each node incident to an edge
    (singletons never enter the pair stream — callers keep them implicitly
    as their own component).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for it in range(max_iter):
        msgs = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("_nbr_min", F.col("component"))
                ).alias("component"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # round 0 always changes something (any b-side node adopts a smaller
        # a-side label) — skip its convergence probe, one job per run saved
        changed = 1 if it == 0 else (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
