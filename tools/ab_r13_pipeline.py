"""r13 pipeline AB: BOTH code versions inside ONE JVM.

Loads deequ_spark alternately from <before_tree> and <after_tree> by
purging sys.modules and swapping sys.path — the Spark session, file
cache, JIT state and Python workers are shared, so the comparison is
immune to the cross-process ambient swing that polluted every
multi-JVM AB in this container (±50% observed). Order alternates per
round; medians reported per side.

Usage: python tools/ab_r13_pipeline.py <before_tree> <after_tree> [rounds]
"""

import json
import statistics
import sys
import time

BEFORE, AFTER = sys.argv[1], sys.argv[2]
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 6
SF_DIR = "/root/testdata/sf0.1"

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def load_tree(tree):
    for mod in [m for m in sys.modules if m.split(".")[0] == "deequ_spark"]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if p not in (BEFORE, AFTER)]
    sys.path.insert(0, tree)
    import deequ_spark.llm.pipeline as pl
    assert pl.__file__.startswith(tree), pl.__file__
    return pl


def main():
    spark = (SparkSession.builder.master("local[32]")
             .appName("ab-r13-pipeline")
             .config("spark.sql.shuffle.partitions", "32")
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
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v):
        import numpy  # noqa: F401
        return v
    spark.range(0, 3200, 1, 32).select(
        _warm(F.col("id").cast("double"))).count()

    sys.path.insert(0, AFTER)
    import bench
    warc_dir = bench.prepare_warc_dir(spark, docs)

    def run_crawl(pl):
        import deequ_spark.llm.warc as warc
        chunks, _ = warc.crawl_to_corpus(spark, warc_dir, source="wet",
                                         min_words=20, quality_filter=False,
                                         collect_stats=False)
        n = chunks.count()
        from deequ_spark.storage import release_checkpoint
        release_checkpoint(chunks)
        return n

    def run_chain(pl):
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
        from deequ_spark.storage import release_checkpoint
        release_checkpoint(out)
        return n

    workloads = {"b27_chain": run_chain, "b24_crawl": run_crawl}
    # warm both code paths once (plan shapes, codegen)
    for tree in (BEFORE, AFTER):
        pl = load_tree(tree)
        for fn in workloads.values():
            fn(pl)

    samples = {w: {"before": [], "after": []} for w in workloads}
    ns = {w: set() for w in workloads}
    for r in range(ROUNDS):
        order = (("before", BEFORE), ("after", AFTER)) if r % 2 == 0 \
            else (("after", AFTER), ("before", BEFORE))
        for label, tree in order:
            pl = load_tree(tree)
            for w, fn in workloads.items():
                spark.sparkContext.setJobDescription(f"{w}:{label}:r{r}")
                t0 = time.perf_counter()
                ns[w].add(fn(pl))
                samples[w][label].append(
                    round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    out = {"rounds": ROUNDS}
    for w in workloads:
        assert len(ns[w]) == 1, f"{w} row counts diverged: {ns[w]}"
        mb = statistics.median(samples[w]["before"])
        ma = statistics.median(samples[w]["after"])
        out[w] = {"n_rows": ns[w].pop(), "before_median": mb,
                  "after_median": ma,
                  "ratio_after_over_before": round(ma / mb, 3),
                  "before": samples[w]["before"],
                  "after": samples[w]["after"]}
    spark.stop()
    import shutil
    shutil.rmtree(warc_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
