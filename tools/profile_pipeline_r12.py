"""Per-stage wall-clock profile of prepare_training_corpus (bench b27
shape) — guide §1: measure first, isolate each stage.

Instruments the stage boundaries by running the pipeline incrementally
with collect_stats=False and timing each note()-materialization via a
monkeypatched localCheckpoint wrapper.  Prints one line per stage.

Usage: python tools/profile_pipeline_r12.py [sf_dir]
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
             .appName("pipeline-profile")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs.count(); emb.count()
    # warm Python workers
    from pyspark.sql.functions import pandas_udf
    import pandas as _pd  # noqa: F401

    @pandas_udf("double")
    def _warm(v):
        import numpy  # noqa: F401
        return v
    n_workers = int(CPUS) if str(CPUS).isdigit() else 32
    spark.range(0, n_workers * 100, 1, n_workers) \
        .select(_warm(F.col("id").cast("double"))).count()

    import deequ_spark.llm.pipeline as pl

    stage_times = {}
    orig_note_checkpoint = {}

    # wrap localCheckpoint timing by monkeypatching prepare via stats hook:
    # collect_stats=True gives per-stage .count() but adds count jobs.
    # Instead patch DataFrame.localCheckpoint to time eager materializations
    DataFrame = type(docs)          # the CLASSIC DataFrame subclass
    orig_lc = DataFrame.localCheckpoint
    seq = []

    import traceback

    def timed_lc(self, eager=True):
        t0 = time.perf_counter()
        out = orig_lc(self, eager=eager)
        caller = next((f"{fr.filename.split('/')[-1]}:{fr.lineno}"
                       for fr in reversed(traceback.extract_stack())
                       if "deequ_spark" in fr.filename), "?")
        seq.append((caller, round(time.perf_counter() - t0, 3)))
        return out
    DataFrame.localCheckpoint = timed_lc

    for rep in range(3):
        seq.clear()
        t0 = time.perf_counter()
        out, _ = pl.prepare_training_corpus(
            docs, "doc_id", "text",
            min_words=20, boilerplate_min_docs=2,
            near_dup_threshold=0.5,
            unicode_normalize=True,
            embeddings=emb.select("vec_id", "embedding"),
            embedding_cols=("vec_id", "embedding"),
            semantic_threshold=0.97, semantic_clusters=8,
            pack_budget=256,
            collect_stats=False,
            gopher_kwargs={"min_stopword_hits": 1})
        n = out.count()
        total = time.perf_counter() - t0
        out.unpersist()
        print(f"run {rep}: total={total:.3f}s n={n} "
              f"checkpoints({len(seq)})={seq}", flush=True)

    DataFrame.localCheckpoint = orig_lc
    spark.stop()


if __name__ == "__main__":
    main()
