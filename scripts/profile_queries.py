#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds.

For each registry query (default: the bench HEADLINE set), runs the query
once at $SPARK_GRAFT_SF_DIR and records wall-clock, Spark job count, stage
count and task count (via a per-query job group + the status tracker), and
optionally dumps ``explain("formatted")`` to a plans directory.

Usage:
  python scripts/profile_queries.py [--queries q100_semantic_dedup,...]
      [--plans-dir plans/r13] [--suffix before] [--out /tmp/profile.json]

The per-job fixed cost on this host is 30-80 ms, so a query's job count is
often the dominant term of its wall clock; this harness makes that visible
per query (guide §1: measure first, attribute time to scheduler vs compute).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from printer_etl_hub_spark.plans import REGISTRY  # noqa: E402
from printer_etl_hub_spark.plans.common import flush_pending_release  # noqa: E402
from printer_etl_hub_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def job_group_metrics(sc, group: str) -> dict:
    """Job/stage/task counts for a finished job group via the status tracker."""
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_stages += 1
                n_tasks += sinfo.numTasks
    return {"jobs": len(job_ids), "stages": n_stages, "tasks": n_tasks}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated names; default: bench HEADLINE")
    ap.add_argument("--plans-dir", default=None, help="dump explain('formatted') here")
    ap.add_argument("--suffix", default="before", help="plan file suffix (before/after)")
    ap.add_argument("--out", default="/tmp/profile.json")
    ap.add_argument("--attempts", type=int, default=1)
    args = ap.parse_args()

    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    else:
        from bench import HEADLINE  # noqa: E402

        names = list(HEADLINE)

    spark = get_spark("profile")
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    # Same warmup as bench.py: one-time JVM init off the clock.
    spark.range(1).select(
        F.lower(F.lit("WARMUP")), F.md5(F.lit("x")), F.regexp_replace(F.lit("a b"), r"\s+", " ")
    ).collect()
    try:
        v = spark.range(4).selectExpr("parse_json('{\"a\": [1]}') AS j")
        v.lateralJoin(spark.tvf.variant_explode(F.col("j").outer())).select(
            F.schema_of_variant(F.col("value"))
        ).collect()
        spark.range(64).repartition(4).mapInPandas(lambda it: it, schema="id long").count()
        REGISTRY["q01_pricing_summary"].fn(spark, SF_DIR).count()
    except Exception as exc:
        print(f"# warmup failed: {exc}", file=sys.stderr)

    # Host fixed-job-cost, for attributing scheduler overhead.
    walls = []
    for _ in range(10):
        t0 = time.perf_counter()
        spark.range(1).count()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    host_ms = round(walls[len(walls) // 2] * 1000.0, 1)
    print(f"# host ms/job: {host_ms}", file=sys.stderr)

    out: dict[str, dict] = {"_host_ms_per_job": host_ms, "_sf_dir": SF_DIR}
    for name in names:
        spec = REGISTRY[name]
        best = None
        for attempt in range(args.attempts):
            spark.catalog.clearCache()
            flush_pending_release()
            group = f"{name}#{attempt}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                df = spec.fn(spark, SF_DIR)
                n_rows = df.count()
                dt = time.perf_counter() - t0
            except Exception as exc:
                out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                print(f"# {name}: FAILED {out[name]['error']}", file=sys.stderr)
                break
            finally:
                sc.setJobGroup("", "")
            m = job_group_metrics(sc, group)
            rec = {"wall": round(dt, 3), "rows": n_rows, **m}
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        if best is None:
            continue
        out[name] = best
        sched = best["jobs"] * host_ms / 1000.0
        print(
            f"# {name}: {best['wall']:.3f}s  jobs={best['jobs']} stages={best['stages']} "
            f"tasks={best['tasks']}  (~{sched:.2f}s fixed job cost)",
            file=sys.stderr,
        )
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            try:
                spark.catalog.clearCache()
                flush_pending_release()
                df = spec.fn(spark, SF_DIR)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                    fh.write(buf.getvalue())
            except Exception as exc:
                print(f"# {name}: plan dump failed: {exc}", file=sys.stderr)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"n": len(names), "out": args.out}))


if __name__ == "__main__":
    main()
