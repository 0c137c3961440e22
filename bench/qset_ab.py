#!/usr/bin/env python
"""Alternating A/B: r3 end-of-round revision vs HEAD, BOTH under the
head methodology (split-sized scan, pinned query path) — attributes
a BENCH-to-BENCH headline delta to code vs host-throttling windows
(the same protocol as headline_ab.py, which compares against r1's
own methodology instead).

Usage: python bench/qset_ab.py [--base eefb354] [--trials 3]
Writes BENCH/qset_ab.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess

from headline_ab import REPO, run_trial

WORKTREE = os.path.join(REPO, ".ab_base")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="eefb354")  # r3 final bench revision
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not os.path.isdir(WORKTREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WORKTREE, args.base],
            cwd=REPO, check=True,
        )
    try:
        trials: list[dict] = []
        for i in range(args.trials):
            for tree, label in ((WORKTREE, "base"), (REPO, "head")):
                r = run_trial(tree, "head", args.docs, args.cpus, args.reps)
                r["rev"] = label
                r["trial"] = i
                trials.append(r)
                print(json.dumps(r), flush=True)

        def best(rev: str, key: str, lo_is_good: bool = True):
            vals = [t[key] for t in trials if t["rev"] == rev and key in t]
            return (min(vals) if lo_is_good else max(vals)) if vals else None

        summary = {
            "base_rev": args.base,
            "head_rev": subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                capture_output=True, text=True,
            ).stdout.strip(),
            "docs": args.docs,
            "cpus": args.cpus,
            "protocol": "alternating trials, per-revision minimum, head methodology on both",
            "build_sec": {"base": best("base", "build_sec"), "head": best("head", "build_sec")},
            "qset_pinned_sec": {
                "base": best("base", "qset_pinned_sec"),
                "head": best("head", "qset_pinned_sec"),
            },
            "qset_unpinned_sec": {
                "base": best("base", "qset_unpinned_sec"),
                "head": best("head", "qset_unpinned_sec"),
            },
            "trials": trials,
        }
        with open(os.path.join(REPO, "BENCH", "qset_ab.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps({k: v for k, v in summary.items() if k != "trials"}, indent=2))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE], cwd=REPO)


if __name__ == "__main__":
    main()
