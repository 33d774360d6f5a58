"""Interleaved same-session AB for r12 wave 3: wave-2 HEAD (3878ebb,
git worktree) vs the wave-3 tree — same method as tools/ab_r12_wave2.py
(A/B alternation, per-workload medians across rounds, RUNS=3 warm
medians per side per round), restricted to the workloads wave 3
touches:

- b24_crawl_ingest    (checkpoint_input: the WARC gunzip+parse is cut
                       once instead of re-executing 3-4x under the
                       boilerplate stage's references; + the HOF
                       boilerplate rebuild)
- b27_pipeline_chain  (HOF boilerplate rebuild — its input is parquet,
                       so checkpoint_input stays off there)
- b28_bloom_join      (build_bloom persists the projected dim keys
                       across sizing count + word build: one dim-side
                       source execution instead of two)

Usage: python tools/ab_r12_wave3.py [n_rounds]   (default 6)
Prereq: git worktree add /tmp/r12_w3_before 3878ebb
Writes tools/AB_R12_WAVE3.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

BEFORE_DIR = "/tmp/r12_w3_before"
AFTER_DIR = "/root/repo"
ONLY = "b24_crawl_ingest,b27_pipeline_chain,b28_bloom_join"
N_ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def run_bench(repo: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_BENCH_RUNS="3",
               SPARK_GRAFT_BENCH_ONLY=ONLY)
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
        for tag, repo in (pair if i % 2 == 0 else pair[::-1]):
            res = run_bench(repo)
            samples[tag].append(res["queries"])
            print(f"round {i + 1} {tag}: "
                  + " ".join(f"{k}={v:.2f}" for k, v in
                             sorted(res["queries"].items())), flush=True)

    common = set(samples["before"][0]) & set(samples["after"][0])
    med = {tag: {w: statistics.median(s[w] for s in runs)
                 for w in common}
           for tag, runs in samples.items()}
    per_wl = {w: {"before": med["before"][w], "after": med["after"][w],
                  "ratio": round(med["after"][w] / med["before"][w], 3)}
              for w in sorted(common)}
    out = {
        "method": "A/B interleaved targeted-bench runs "
                  f"(SPARK_GRAFT_BENCH_ONLY={ONLY}), RUNS=3 warm medians "
                  "per side per round, per-workload medians across rounds",
        "rounds": N_ROUNDS,
        "before_commit": "3878ebb (wave-2 HEAD)",
        "per_workload": per_wl,
        "subset_ratio": round(sum(med["after"].values())
                              / sum(med["before"].values()), 3),
        "raw_samples": samples,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "AB_R12_WAVE3.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["per_workload"]))
    print(json.dumps({"subset_ratio": out["subset_ratio"]}))


if __name__ == "__main__":
    main()
