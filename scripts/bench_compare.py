#!/usr/bin/env python
"""Diff two per-query bench detail files (BENCH_DETAIL_r0N.json).

The reason the detail files are committed per round (VERDICT r8 item
#2): round-over-round deltas are only signal when the per-query history
survives. This prints, for the query set present in BOTH files, the
best-of-k walls side by side with the ratio, flags queries whose ratio
exceeds the threshold in either direction, and summarizes the overlap
totals — so "is this a regression or host weather?" is one command,
not a judge re-measurement.

Usage:
    python scripts/bench_compare.py BENCH_DETAIL_r08.json BENCH_DETAIL_r09.json
    python scripts/bench_compare.py old.json new.json --threshold 1.5
"""

from __future__ import annotations

import argparse
import json


def best(attempts: dict[str, list[float]]) -> dict[str, float]:
    return {k: min(v) for k, v in attempts.items() if v}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratio above this (or below its inverse)")
    args = ap.parse_args()
    a = best(json.load(open(args.old))["attempts"])
    b = best(json.load(open(args.new))["attempts"])
    shared = sorted(set(a) & set(b))
    only_old = sorted(set(a) - set(b))
    only_new = sorted(set(b) - set(a))
    flagged = []
    for name in shared:
        r = b[name] / a[name] if a[name] > 0 else float("inf")
        if r > args.threshold or r < 1.0 / args.threshold:
            flagged.append((r, name))
    flagged.sort(reverse=True)
    for r, name in flagged:
        print(f"{'SLOWER' if r > 1 else 'faster':6s} {r:6.2f}x  {name}: "
              f"{a[name]:.3f}s -> {b[name]:.3f}s")
    ta, tb = sum(a[n] for n in shared), sum(b[n] for n in shared)
    print(f"\noverlap: {len(shared)} queries, {ta:.1f}s -> {tb:.1f}s "
          f"({tb / ta:.2f}x)" if ta else "no overlap")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)} "
              f"(+{sum(b[n] for n in only_new):.1f}s)")
    print(json.dumps({
        "overlap_n": len(shared),
        "overlap_ratio": round(tb / ta, 3) if ta else None,
        "flagged": [n for _, n in flagged],
        "added_n": len(only_new),
    }))


if __name__ == "__main__":
    main()
