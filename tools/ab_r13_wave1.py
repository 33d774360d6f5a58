"""r13 wave-1 AB: same-JVM conf flips, interleaved, medians.

Flips under test (both default ON; OFF = the r12 behavior):
  * b4_histogram_entropy — spark.deequ.runner.shareHistogramShuffle
    (standalone Histogram rides the same-column grouping bucket's
    shuffle; OFF = its own corpus groupBy + two lazy post-state scans)
  * b11_embedding_near_dup — spark.deequ.dedup.annEagerVerifyMaxRows
    (materialize the candidate set, skip the verify joins when it is
    empty; 0 = fully-lazy r12 plan)

Methodology per OPTIMIZATION_r12.md: one JVM, order alternated per
round, per-side medians — cross-run bench subtraction carries ±15-25%
ambient swing in this container, a conf flip inside one JVM does not.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))


def main():
    spark = (SparkSession.builder.master("local[32]")
             .appName("ab-r13-wave1")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lineitem.count(); emb.count()
    # warm Arrow workers (bench does the same)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v):
        import numpy  # noqa: F401
        return v
    spark.range(0, 3200, 1, 32).select(
        _warm(F.col("id").cast("double"))).count()

    KNOBS = {
        "b4_histogram_entropy": (
            "spark.deequ.runner.shareHistogramShuffle",
            {"on": "true", "off": "false"},
            lambda: bench.b4_histogram_entropy(spark, lineitem)),
        "b11_embedding_near_dup": (
            "spark.deequ.dedup.annEagerVerifyMaxRows",
            {"on": str(1 << 20), "off": "0"},
            lambda: bench.b11_embedding_near_dup(spark, emb)),
    }
    # warm BOTH plan shapes once (codegen + Arrow worker spin-up land
    # here, not in round 0's first-timed side)
    for w, (knob, vals, fn) in KNOBS.items():
        for side in ("on", "off"):
            spark.conf.set(knob, vals[side])
            fn()
            spark.conf.unset(knob)
    samples = {w: {"on": [], "off": []} for w in KNOBS}
    for r in range(ROUNDS):
        order = ("on", "off") if r % 2 == 0 else ("off", "on")
        for w, (knob, vals, fn) in KNOBS.items():
            for side in order:
                spark.conf.set(knob, vals[side])
                spark.sparkContext.setJobDescription(f"{w}:{side}:r{r}")
                t0 = time.perf_counter()
                fn()
                samples[w][side].append(
                    round(time.perf_counter() - t0, 3))
                spark.conf.unset(knob)
        spark.sparkContext.setJobDescription(None)
    out = {}
    for w in KNOBS:
        m_on = statistics.median(samples[w]["on"])
        m_off = statistics.median(samples[w]["off"])
        out[w] = {"on_median": m_on, "off_median": m_off,
                  "ratio_on_over_off": round(m_on / m_off, 3),
                  "on": samples[w]["on"], "off": samples[w]["off"]}
    spark.stop()
    print(json.dumps({"rounds": ROUNDS, "results": out}, indent=1))


if __name__ == "__main__":
    main()
