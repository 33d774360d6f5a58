"""Disambiguate the r10 bench drift: ambient load vs code (judge ask #3).

r10's suite ran ~12% slower than r9 UNIFORMLY (every workload slower,
none improved, no code change behind the four past-spread workloads) —
the signature of ambient machine load, but one-HEAD-per-round runs
can't prove it. This script applies the AB_B6 interleaving methodology
at the PROCESS level: full bench.py runs of r10-HEAD (git worktree at
5e3186e) and r11-HEAD alternate A/B/A/B/... in ONE session, each with
SPARK_GRAFT_BENCH_RUNS=1, so any ambient drift during the session hits
both versions equally and the per-workload MEDIAN difference isolates
the code effect.

Usage: python tools/ab_drift_r11.py [n_rounds]
Writes tools/AB_DRIFT_R11.json; summarize findings in AB_DRIFT_R11_NOTE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

R10_DIR = "/tmp/r10repo"
R11_DIR = "/root/repo"
N_ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def run_bench(repo: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_BENCH_RUNS="1")
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
    samples = {"r10": [], "r11": []}
    for i in range(N_ROUNDS):
        for tag, repo in (("r10", R10_DIR), ("r11", R11_DIR)):
            res = run_bench(repo)
            samples[tag].append(res["queries"])
            print(f"round {i + 1} {tag}: total "
                  f"{sum(res['queries'].values()):.1f}s", flush=True)

    common = set(samples["r10"][0]) & set(samples["r11"][0])
    med = {tag: {w: statistics.median(s[w] for s in runs)
                 for w in common}
           for tag, runs in samples.items()}
    per_wl = {w: {"r10": med["r10"][w], "r11": med["r11"][w],
                  "ratio": round(med["r11"][w] / med["r10"][w], 3)
                  if med["r10"][w] else None}
              for w in sorted(common)}
    t10 = sum(med["r10"].values())
    t11 = sum(med["r11"].values())
    out = {
        "method": f"process-level ABAB x{N_ROUNDS}, runs=1 each, "
                  "medians over rounds",
        "r10_head": "5e3186e",
        "common_workloads": len(common),
        "total_r10": round(t10, 2),
        "total_r11": round(t11, 2),
        "suite_ratio_r11_over_r10": round(t11 / t10, 3),
        "per_workload": per_wl,
        "raw_samples": samples,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "AB_DRIFT_R11.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("total_r10", "total_r11",
                       "suite_ratio_r11_over_r10")}))


if __name__ == "__main__":
    main()
