"""Wave-4 AB: sequential vs overlapped runner execution groups.

The r12 wave-4 change (analysis_runner._run_task_groups, guide §2.6)
submits the runner's independent per-group actions from a small thread
pool. Both modes are the SAME code under
`spark.deequ.runner.maxConcurrentGroups` (1 = sequential, default 3 =
overlapped), so this AB is a pure same-JVM conf flip — no worktree, no
import games: interleaved rounds, order flipped each round, medians per
mode over the workloads whose job structure has >1 independent group
(b3 scan+grouping, b4 three groups, b12 per-batch scan+grouping,
b13 profiler passes with several groups, b1 single group as a control).

Usage: python tools/ab_r12_wave4.py [rounds]  → tools/AB_R12_WAVE4.json
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  — reuse the exact bench workload bodies

from pyspark.sql import SparkSession  # noqa: E402


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = bench.SF_DIR
    cpus = bench.CPUS
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("ab-r12-wave4")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lineitem.count()
    stream_src = bench.prepare_stream_source(spark, sf_dir)

    workloads = [
        ("b1_scan_fused", lambda: bench.b1_scan_fused(spark, lineitem)),
        ("b3_verification", lambda: bench.b3_verification(spark, lineitem)),
        ("b4_histogram_entropy",
         lambda: bench.b4_histogram_entropy(spark, lineitem)),
        ("b12_streaming",
         lambda: bench.b12_streaming(spark, sf_dir, stream_src)),
        ("b13_profile", lambda: bench.b13_profile(spark, sf_dir)),
    ]

    # warm every workload once (codegen, Arrow workers, file listing)
    for _, fn in workloads:
        fn()

    samples = {m: {n: [] for n, _ in workloads} for m in ("seq", "conc")}
    for rnd in range(rounds):
        modes = [("seq", "1"), ("conc", "3")]
        if rnd % 2:
            modes.reverse()
        for mode, conf in modes:
            spark.conf.set("spark.deequ.runner.maxConcurrentGroups", conf)
            for name, fn in workloads:
                t0 = time.perf_counter()
                fn()
                samples[mode][name].append(
                    round(time.perf_counter() - t0, 3))
    spark.conf.unset("spark.deequ.runner.maxConcurrentGroups")

    med = {m: {n: round(statistics.median(v), 3)
               for n, v in per.items()}
           for m, per in samples.items()}
    subset = {m: round(sum(per.values()), 3) for m, per in med.items()}
    out = {
        "method": ("same-JVM conf flip, interleaved, order alternated "
                   f"per round, {rounds} rounds, medians"),
        "knob": "spark.deequ.runner.maxConcurrentGroups (1 vs 3)",
        "medians": med,
        "samples": samples,
        "subset_seconds": subset,
        "ratio": round(subset["conc"] / subset["seq"], 3),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "AB_R12_WAVE4.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    print(json.dumps({"medians": med, "subset": subset,
                      "ratio": out["ratio"]}))


if __name__ == "__main__":
    main()
