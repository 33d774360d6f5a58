"""Isolated AB of the r12 inherited regressions (guide §1): b22
classify with/without the fps bloom pre-filter, b23 image phash, and
b27 pipeline chain — interleaved reps in ONE session so ambient drift
cancels.

Usage: python tools/ab_b22_b27_r12.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else \
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("ab-b22-b27")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import bench

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs.count(); emb.count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v):
        import numpy  # noqa: F401
        return v
    spark.range(0, 3200, 1, 32).select(_warm(F.col("id").cast("double"))).count()

    idx_pair = bench.prepare_dedup_index(spark, docs)
    images = bench.prepare_images(spark)

    import deequ_spark.llm.incremental as incr
    orig_geom = incr._fps_bloom_geometry

    def b22():
        return bench.b22_incremental_dedup(spark, idx_pair)

    def b22_nobloom():
        incr._fps_bloom_geometry = lambda *a: None
        try:
            return bench.b22_incremental_dedup(spark, idx_pair)
        finally:
            incr._fps_bloom_geometry = orig_geom

    def b23():
        return bench.b23_image_phash(spark, images)

    def b27():
        return bench.b27_pipeline_chain(spark, docs, emb)

    tasks = [("b22_bloom", b22), ("b22_nobloom", b22_nobloom),
             ("b23", b23), ("b27", b27)]
    samples = {n: [] for n, _ in tasks}
    for rep in range(5):
        for name, fn in tasks:
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            samples[name].append(dt)
            print(f"rep{rep} {name}: {dt}s", flush=True)
    import statistics
    for name, s in samples.items():
        print(f"MEDIAN {name}: {statistics.median(s)}  all={s}", flush=True)
    spark.stop()
    import shutil
    shutil.rmtree(idx_pair[0], ignore_errors=True)


if __name__ == "__main__":
    main()
