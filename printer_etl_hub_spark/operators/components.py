"""Connected components for duplicate-cluster labeling.

Near-dup detectors (MinHash-LSH, n-gram Jaccard, SimHash — operators/
dedup.py) emit PAIRS; a training-data pipeline needs per-document CLUSTER
labels ("keep one doc per component"). This is min-label propagation with
POINTER JUMPING over the pair graph, expressed as iterative DataFrame joins
with a driver-side convergence check — seeded by a PARTITION-LOCAL
union-find (r14; the two-phase/local-contraction CC idea of Kiveris et
al. 2014, "Connected Components in MapReduce and Beyond"): each edge
partition contracts its own slice in one narrow Arrow pass before any
distributed round, so the loop only pays rounds for chains that CROSS
partitions.

Round structure (each is a shuffle join on node id):
1. neighbor-min message: component(n) ← min over neighbors' components —
   plain label propagation, advances a min label ONE hop per round
   (O(diameter) alone — a 10^6-node chain would need 10^6 rounds);
2. pointer jump: component(n) ← previous_labels(component(n)) — labels are
   node ids, so resolving each stepped label through the PREVIOUS round's
   (already-materialized) label table halves every label-chain, giving the
   O(log n) convergence of hash-to-min / Kiveris-style MapReduce CC with
   the same join primitives and a LINEAR per-round plan (resolving through
   the round's own output would duplicate the message-join subtree in
   every plan).

Each round ends in a lazy ``localCheckpoint`` (materialized by the round's
convergence probe): without truncation the logical plan grows per round and
ANALYSIS time (not execution — the cache serves reads) grows exponentially
(measured: 0.5s → 3.5s → 27s → 159s per round on a 100-node chain).
Checkpointing flattens the plan to a LogicalRDD each round — the same
lineage-cut every iterative Spark algorithm (GraphX/GraphFrames) performs.
localCheckpoint is executor-local (lost on executor failure); pass
``checkpoint_dir=`` to use reliable ``checkpoint()`` on a real cluster when
retry-safety across rounds matters more than speed.

The round loop runs with AQE disabled and a shuffle width derived from the
materialized edge count (both restored on exit): AQE turns every exchange
of every round into its own query-stage job for a plan whose shape is
fixed and already known — see the inline notes for the measured job/stage
counts.

The convergence probe is a LIMIT-1 existence check, not a full count.
Non-convergence RAISES — silently returning partial labels would split
clusters without any signal.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..bounded import bounded_collect
from ..execution import loop_execution


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    *,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Label every node of the pair graph with its component's minimum id.

    Returns ``(node, component)`` for each node incident to an edge
    (singletons never enter the pair stream — callers keep them implicitly
    as their own component). Raises RuntimeError if ``max_iter`` rounds do
    not converge (needs ~log2(diameter) + 2 rounds).

    ``checkpoint_dir``: when set, per-round lineage cuts use RELIABLE
    ``checkpoint()`` under that directory instead of executor-local
    ``localCheckpoint()`` — survives executor loss, the right choice on a
    real cluster where a retried task must not lose a round's labels.
    Checkpoint data does NOT accumulate per round: each round writes to
    its own subdirectory and the previous round's subdirectory is deleted
    as soon as nothing references it (Spark itself only cleans checkpoints
    with ``spark.cleaner.referenceTracking.cleanCheckpoints=true``, which
    defaults to false). On return, ``cc-base`` (the edge input) and the
    final round's subdirectory remain — delete ``checkpoint_dir`` when
    done consuming the result. NOTE: ``setCheckpointDir`` is
    SparkContext-GLOBAL; this call leaves it pointing into
    ``checkpoint_dir``, so concurrent checkpoint users of the same context
    should set their own dir. Default stays local (fastest, fine on local
    mode / short jobs).

    ``stats``: optional dict the call fills with convergence telemetry
    (``rounds`` = iterations executed, ``edges`` = symmetrized distinct
    edge count) — the observability hook the scale audit reads.
    """
    sc = edges.sparkSession.sparkContext

    def _rm(path_str: str) -> None:
        jvm = edges.sparkSession._jvm
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = p.getFileSystem(edges.sparkSession._jsc.hadoopConfiguration())
        fs.delete(p, True)

    def _cut(df: DataFrame, subdir: str = "cc-base", eager: bool = True) -> DataFrame:
        if checkpoint_dir is not None:
            # Reliable checkpoints stay EAGER even when the caller asks for
            # lazy: a lazy reliable checkpoint is not persisted, so Spark
            # recomputes the whole round to write the checkpoint files at
            # the end of the first job that touches it — paying the round
            # twice. localCheckpoint persists on first materialization, so
            # lazy is free there.
            sc.setCheckpointDir(f"{checkpoint_dir}/{subdir}")
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=eager)

    # Materialize the edge input ONCE before the symmetrization union — its
    # two branches would otherwise re-execute the caller's whole pair
    # pipeline (measured: the q72 near-dup DAG ran twice, ~9s of a 13s run).
    # The cut is LAZY and the sizing count is its materializing action
    # (r14): an eager cut followed by a count paid two job submissions for
    # one materialization (the CC round idiom, applied to the edge cut).
    # Reliable checkpoints stay eager inside _cut, where the count then
    # reads the checkpoint files.
    edges = _cut(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")), eager=False
    )
    n_edges = edges.count()
    spark = edges.sparkSession
    # Round-loop execution posture (r13 optimization, guide §1.2/§2):
    # AQE OFF and a shuffle width derived from the symmetrized edge count
    # for the duration of the loop only (see execution.loop_execution;
    # restored on exit). AQE materializes every exchange of every round
    # as its own query-stage JOB — measured on q100's 11-round graph: 87
    # jobs/201 stages with AQE vs 29/88 without, identical labels — and
    # its per-round re-planning buys nothing here: the loop's plan shape
    # is fixed and known (sym pre-partitioned and pre-sorted on the join
    # key, label frames node-sized), and the min() aggregations are
    # partial-aggregable map-side, so a hot node folds before its
    # shuffle. Callers' plans outside the loop (including the returned
    # labels' consumers) run with the session's own settings.
    with loop_execution(spark, 2 * n_edges) as loop_parts:
        # Partition AND sort the symmetrized edge table by its JOIN KEY
        # before pinning it (r13 optimization, guide §2.4): every round's
        # message join probes sym on "a". The cached outputPartitioning /
        # outputOrdering satisfy the sort-merge join's requirements, so
        # rounds exchange and sort only the (node-sized) label side —
        # the edge table (at 100 TB the whole graph) is never re-shuffled
        # or re-sorted after this one materialization.
        sym = (
            edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct()
            .repartition(loop_parts, "a")
            .sortWithinPartitions("a")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # Initial labels (r14 optimization — two-phase CC, the
        # local-contraction idea of Kiveris et al. 2014): instead of the
        # identity labeling, run a PARTITION-LOCAL union-find over the
        # already-materialized edge blocks (one narrow mapInPandas — the
        # only Python stage in the operator, (id, id) pairs through
        # Arrow) and start the rounds from each node's WITHIN-PARTITION
        # component minimum. Every within-partition chain collapses
        # before the first distributed round, so the loop only resolves
        # CROSS-partition chains: round count drops from O(log diameter)
        # to O(log cross-partition diameter) (measured on q100's
        # chain-like cosine graph: 12 rounds → 1). Per-task memory is
        # O(nodes per partition) — bounded by the same partition sizing
        # that bounds the join state. Correctness: union-by-min keeps
        # every root the MINIMUM id of its tree, so the initial labels
        # satisfy exactly the loop's invariants (label(x) ≤ x, label(x)
        # in x's component), and the monotone Σ-probe argument below is
        # unchanged — any valid contraction start converges to the same
        # component-min fixpoint. Non-bigint ids keep the identity init
        # (every current caller is bigint; the probe's DECIMAL sum
        # already requires numeric ids).
        id_type = dict(edges.dtypes)["a"]
        if id_type == "bigint":

            def _local_uf(batches):
                import pandas as pd

                parent: dict = {}

                def find(x):
                    r = x
                    while parent.get(r, r) != r:
                        r = parent[r]
                    while parent.get(x, x) != x:
                        parent[x], x = r, parent[x]
                    return r

                seen = set()
                for pdf in batches:
                    for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
                        seen.add(a)
                        seen.add(b)
                        ra, rb = find(a), find(b)
                        if ra == rb:
                            continue
                        if rb < ra:
                            ra, rb = rb, ra
                        parent[rb] = ra
                nodes = sorted(seen)
                yield pd.DataFrame(
                    {"node": nodes, "component": [find(x) for x in nodes]}
                )

            init = (
                edges.select("a", "b")
                .mapInPandas(_local_uf, schema="node bigint, component bigint")
                # a node seen by several partitions carries one candidate
                # label per partition — fold to one row per node (min is
                # a valid same-component contraction of contractions)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
        else:  # pragma: no cover - no current caller
            init = (
                sym.select(F.col("a").alias("node"))
                .distinct()
                .withColumn("component", F.col("node"))
            )
        # Lazy cut + initial Σ-probe in ONE job (the round idiom below):
        # with a contraction start, round 0 can already be the fixpoint,
        # so the old "round 0 always changes" shortcut no longer holds —
        # seed prev_sum from the initial labels instead.
        labels = _cut(init, eager=False)
        prev_sum = bounded_collect(
            labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ),
            1,
            "connected_components initial-label probe",
        )[0].s
        for it in range(max_iter):
            # LP step as (neighbor messages ∪ self-label) → one min per
            # node (r13 optimization): the former shape computed neighbor
            # minima with a groupBy, then LEFT-JOINED them back onto
            # labels to coalesce message-less nodes — a second node-keyed
            # join (and its exchange) per round. Every node is present in
            # ``labels``, so unioning the self-label rows into the message
            # stream makes the single min(component) aggregation compute
            # least(own, nbr_min) directly: same monotone update, one join
            # and one exchange fewer per round.
            stepped = (
                sym.join(labels, sym["a"] == labels["node"])
                .select(F.col("b").alias("node"), F.col("component"))
                .union(labels.select("node", "component"))
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            # Pointer jump THROUGH THE PREVIOUS ROUND'S labels (r13
            # optimization): labels are node ids of the same component
            # with label(x) ≤ x, so resolving the stepped label through
            # ANY label table contracts chains while preserving the
            # component invariant — and the previous round's table is
            # already materialized (the localCheckpoint below), so the
            # jump join is one linear chain over cached blocks. The
            # former self-jump (resolving through ``stepped`` itself)
            # halves chains one round sooner but duplicates the whole
            # message-join+groupBy subtree inside every round's plan —
            # measured on q100's 11-round chain graph: self-jump 37
            # jobs/111 stages/1608 tasks vs stale-jump 29/88/1010 at one
            # extra round, identical labels. Skipped in round 0: near-dup
            # cliques converge on LP alone by round 1 and never pay the
            # jump join. (A hash-to-min root relay and a SECOND jump per
            # round were tried this round and REVERTED: they halve the
            # round count on long-chain graphs, but each adds a
            # |nodes|-sized shuffle stage per round, and on the bench's
            # cliquey near-dup graphs job count rose ~2x and wall clock
            # regressed 20-45%. Per guide §1.2: the round schedule is
            # already O(log D); per-round stage count is what this
            # operator pays for.)
            if it > 0:
                lbl_map = labels.select(
                    F.col("node").alias("_ln"), F.col("component").alias("_lc")
                )
                stepped = stepped.join(
                    lbl_map, stepped["component"] == F.col("_ln"), "left"
                ).select(
                    "node",
                    F.coalesce("_lc", "component").alias("component"),
                )
            # Lazy cut (r13 optimization): the convergence probe below is
            # the round's first action on new_labels, so it materializes
            # the checkpoint AND reads the sum in ONE job submission
            # instead of an eager-checkpoint job followed by a probe job —
            # one fewer driver barrier per round, same lineage truncation
            # (the RDD is marked before the action; every later consumer
            # reads the persisted blocks).
            new_labels = _cut(stepped, f"cc-round-{it}", eager=False)
            # Convergence probe: per-node labels are MONOTONE
            # non-increasing across rounds (least(old, nbr_min) ≤ old, and
            # the jump resolves through label(x) ≤ x), so Σ component is
            # strictly decreasing until the fixed point — equal sums ⇔ no
            # node changed, and a stable sum implies plain-LP stability
            # (the jump only ever lowers labels), i.e. labels constant per
            # component = the component minimum. One shuffle-free scalar
            # agg per round instead of the former old⋈new join probe (a
            # broadcast-join + count job — measured at ~2 extra job
            # submissions per round on q100's driver-latency-bound
            # profile). DECIMAL(38,0) keeps the sum exact for any bigint
            # id set. prev_sum is seeded from the initial labels, so a
            # round-0 fixpoint (the common case under the union-find
            # init) is detected immediately.
            new_sum = bounded_collect(
                new_labels.agg(
                    F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
                ),
                1,
                "connected_components convergence probe",
            )[0].s
            changed = int(new_sum != prev_sum)
            prev_sum = new_sum
            # The previous ROUND's checkpoint is dead once this round is
            # eagerly materialized (nothing references old labels anymore —
            # the sum probe reads only new_labels): sym recomputes from the
            # cc-base edges, never from round files.
            if checkpoint_dir is not None and it >= 1:
                _rm(f"{checkpoint_dir}/cc-round-{it - 1}")
            labels = new_labels
            if changed == 0:
                if stats is not None:
                    stats["rounds"] = it + 1
                    stats["edges"] = sym.count()
                sym.unpersist()
                return labels
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter too large for the iteration budget)"
        )
