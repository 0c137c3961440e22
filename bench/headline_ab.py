#!/usr/bin/env python
"""Back-to-back headline A/B: r1 revision vs HEAD, one session.

VERDICT r2 flagged an unattributed regression in the local[32]
headline bench (bm25 q/s 10.14 → 3.59, build 1,146 → 968 docs/s)
between BENCH_r01 and BENCH_r02 — but those numbers were taken hours
apart on a host whose available throughput swings >2×. This harness
settles it: the two revisions run ALTERNATING in one session
(r1, head, r1, head, …), each trial a fresh subprocess executing
bench/headline_phase.py (phases 2+3 only) under that revision's tree
and its own bench methodology, per-revision MINIMUM kept (the
least-throttled sample of identical work, same rule as
bench/scaling.py). Results → BENCH/headline_ab.json.

Usage: python bench/headline_ab.py [--trials 3] [--docs 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1_REV = "3c70217"  # round 1 end-of-round snapshot (BENCH_r01's code)
WORKTREE = os.path.join(REPO, ".ab_r1")


def run_trial(tree: str, style: str, docs: int, cpus: int, reps: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "AB_STYLE": style,
            "AB_DOCS": str(docs),
            "AB_CPUS": str(cpus),
            "AB_REPS": str(reps),
            "PYTHONPATH": tree,
        }
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench", "headline_phase.py")],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"trial ({style}) produced no ABRESULT; tail:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not os.path.isdir(WORKTREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WORKTREE, R1_REV],
            cwd=REPO,
            check=True,
        )
    try:
        trials: list[dict] = []
        for i in range(args.trials):
            for tree, style in ((WORKTREE, "r1"), (REPO, "head")):
                r = run_trial(tree, style, args.docs, args.cpus, args.reps)
                r["trial"] = i
                trials.append(r)
                print(json.dumps(r), flush=True)

        def best(style: str, key: str, lo_is_good: bool = True):
            vals = [t[key] for t in trials if t["style"] == style and key in t]
            return (min(vals) if lo_is_good else max(vals)) if vals else None

        summary = {
            "r1_rev": R1_REV,
            "head_rev": subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=REPO,
                capture_output=True,
                text=True,
            ).stdout.strip(),
            "docs": args.docs,
            "cpus": args.cpus,
            "protocol": "alternating trials, per-revision minimum (least-throttled)",
            "build_sec": {"r1": best("r1", "build_sec"), "head": best("head", "build_sec")},
            "docs_per_sec": {
                "r1": best("r1", "docs_per_sec", False),
                "head": best("head", "docs_per_sec", False),
            },
            "qset_unpinned_sec": {
                "r1": best("r1", "qset_unpinned_sec"),
                "head": best("head", "qset_unpinned_sec"),
            },
            "qset_pinned_sec": {"head": best("head", "qset_pinned_sec")},
            "trials": trials,
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "headline_ab.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps({k: v for k, v in summary.items() if k != "trials"}, indent=2))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE], cwd=REPO)


if __name__ == "__main__":
    main()
