"""Interleaved same-session AB: pre-optimization r12 HEAD (worktree at
17c1407, the inherited mid-build state) vs optimized HEAD — the r11
verdict's prescribed method for round-over-round perf claims (cross-
round BENCH files carry ±15% ambient swing; A/B/A/B alternation in one
session hits both versions with the same ambient drift, so the
per-workload MEDIAN ratio isolates the code effect).

Usage: python tools/ab_r12_opt.py [n_rounds]   (default 3)
Prereq: git worktree add /tmp/repo_before 17c1407
Writes tools/AB_R12_OPT.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

BEFORE_DIR = "/tmp/repo_before"
AFTER_DIR = "/root/repo"
N_ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def run_bench(repo: str) -> dict:
    # RUNS=3: each side reports ITS OWN interleaved warm medians — a
    # single cold sample per workload carries multi-second codegen/JIT
    # noise (the r5 phantom-regression lesson bench.py's medians exist
    # for; a RUNS=1 pilot of this AB reproduced it: untouched workloads
    # "regressed" 10-26% and b23 2.2x on pure first-call noise)
    env = dict(os.environ, SPARK_GRAFT_BENCH_RUNS="3")
    proc = subprocess.run([sys.executable, "bench.py"], cwd=repo,
                          env=env, capture_output=True, text=True,
                          timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"bench in {repo} failed:\n{proc.stderr[-2000:]}")
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench in {repo}")


def main():
    samples = {"before": [], "after": []}
    pair = [("before", BEFORE_DIR), ("after", AFTER_DIR)]
    for i in range(N_ROUNDS):
        # flip order each round so a within-pair ambient trend (page
        # cache, thermals) cannot systematically charge one side
        for tag, repo in (pair if i % 2 == 0 else pair[::-1]):
            res = run_bench(repo)
            samples[tag].append(res["queries"])
            print(f"round {i + 1} {tag}: total "
                  f"{sum(res['queries'].values()):.1f}s", flush=True)

    common = set(samples["before"][0]) & set(samples["after"][0])
    med = {tag: {w: statistics.median(s[w] for s in runs)
                 for w in common}
           for tag, runs in samples.items()}
    per_wl = {w: {"before": med["before"][w], "after": med["after"][w],
                  "ratio": round(med["after"][w] / med["before"][w], 3)
                  if med["before"][w] else None}
              for w in sorted(common)}
    out = {
        "method": "A/B interleaved full-bench runs, 1 sample per round, "
                  "per-workload medians across rounds",
        "rounds": N_ROUNDS,
        "before_commit": "17c1407 (inherited mid-build HEAD)",
        "totals_before": [round(sum(s.values()), 1)
                          for s in samples["before"]],
        "totals_after": [round(sum(s.values()), 1)
                         for s in samples["after"]],
        "median_total_before": round(sum(med["before"].values()), 1),
        "median_total_after": round(sum(med["after"].values()), 1),
        "suite_ratio": round(sum(med["after"].values())
                             / sum(med["before"].values()), 3),
        "per_workload": per_wl,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "AB_R12_OPT.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("suite_ratio", "median_total_before",
                       "median_total_after")}))


if __name__ == "__main__":
    main()
