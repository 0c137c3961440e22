#!/usr/bin/env python
"""Per-gate bench comparison: new bench JSON vs a previous round's
BENCH_r{N}.json. Prints gates slower by more than --threshold x (with
absolute seconds), new gates, and removed gates — the round-over-round
regression census VERDICT asks for before landing a round.

Usage: python bench/gate_diff.py BENCH_r03.json /tmp/bench_r4.json [--threshold 1.5]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    old = json.load(open(args.old)).get("queries", {})
    new_doc = json.load(open(args.new))
    new = new_doc.get("queries", {})

    slower, faster = [], []
    for k, nv in new.items():
        ov = old.get(k)
        if ov is None or ov <= 0:
            continue
        r = nv / ov
        if r >= args.threshold and nv >= 0.5:
            slower.append((r, k, ov, nv))
        elif r <= 1 / args.threshold and ov >= 0.5:
            faster.append((r, k, ov, nv))

    print(f"gates: old={len(old)} new={len(new)} "
          f"added={sorted(set(new) - set(old))} removed={sorted(set(old) - set(new))}")
    print(f"\n== slower >= {args.threshold}x (and >= 0.5 s) ==")
    for r, k, ov, nv in sorted(slower, reverse=True):
        print(f"  {k}: {ov:.2f}s -> {nv:.2f}s ({r:.2f}x)")
    print(f"\n== faster >= {args.threshold}x (and was >= 0.5 s) ==")
    for r, k, ov, nv in sorted(faster):
        print(f"  {k}: {ov:.2f}s -> {nv:.2f}s ({1 / r:.2f}x)")
    tot_old = sum(old.get(k, 0) for k in new if k in old)
    tot_new = sum(v for k, v in new.items() if k in old)
    print(f"\nshared-gate total: {tot_old:.1f}s -> {tot_new:.1f}s")


if __name__ == "__main__":
    main()
