"""Wave-3 measurement harness (guide §1: measure first, isolate).

Pieces profiled, each with the noop sink so the computation is timed,
not the sink, and labelled via setJobDescription:

1. WARC parse alone (b24's ingest half) — wet_documents over the bench
   warc fixture, noop.
2. b24 as shipped (crawl_to_corpus) vs the same chain with the raw
   extraction localCheckpoint-ed first — quantifies how many times the
   uncut gunzip+parse subtree executes under the boilerplate stage's
   multiple references (the pipeline's first cut_in skips when no
   transform has run yet, which is right for re-scannable parquet and
   wrong for an expensive opaque parse).
3. remove_boilerplate_lines at bench scale over the docs corpus:
   (a) the boiler-set aggregation alone (+ |boiler| row count),
   (b) the full join-based rebuild (pipeline projection: id + cleaned),
   (c) a HOF prototype: collect the boiler set's aggregate ONCE via a
       scalar subquery and rebuild per-row with filter(split(text)) —
       no kept-side explode, no groupBy(id) reassembly shuffle, no
       final join. Value-compared against (b) exactly.

Usage: python tools/profile_wave3_r12.py [sf_dir]
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
REPS = int(os.environ.get("REPS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    outs = []
    for _ in range(REPS):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        outs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    import statistics
    print(f"{label}: median={statistics.median(outs):.3f}s samples={outs}",
          flush=True)
    return out


def main():
    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("wave3-profile")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()

    # ---- piece 3: boilerplate at bench scale --------------------------
    from deequ_spark.llm.text import remove_boilerplate_lines
    min_docs, min_chars = 2, 4

    lines = docs.select(F.col("doc_id").alias("__bid"),
                        F.posexplode(F.split(F.col("text"), "\n"))
                        .alias("__pos", "__line"))
    boiler = (lines.where(F.length(F.trim("__line")) >= min_chars)
              .groupBy("__line")
              .agg(F.countDistinct("__bid").alias("__docs"))
              .where(F.col("__docs") >= min_docs).select("__line"))
    n_boiler = timed(spark, "boiler agg (count)", boiler.count)
    print(f"|boiler| = {n_boiler}", flush=True)

    full = remove_boilerplate_lines(docs.select("doc_id", "text"),
                                    "doc_id", "text", min_docs=min_docs)
    pruned = full.select("doc_id", F.col("cleaned").alias("text"))
    timed(spark, "boilerplate join-rebuild (pipeline projection)",
          lambda: noop(pruned))

    # HOF prototype: one scalar-subquery collect of the boiler lines,
    # per-row filter — semantics: drop a line iff it is in the set
    boiler.localCheckpoint(eager=True).createOrReplaceTempView("__w3_boiler")
    blines = F.expr("(SELECT coalesce(collect_list(__line), array()) "
                    "FROM __w3_boiler)")
    # subqueries are rejected inside HOF lambdas: hoist the scalar
    # subquery into its own projected column, reference the column
    hof = (docs.withColumn("__bl", blines)
           .select(
               "doc_id",
               F.array_join(
                   F.filter(F.split(F.col("text"), "\n"),
                            lambda l: ~F.array_contains(F.col("__bl"), l)),
                   "\n").alias("text")))
    timed(spark, "boilerplate HOF rebuild (prototype)", lambda: noop(hof))

    # value identity of the two rebuilds
    diff = (pruned.withColumnRenamed("text", "a")
            .join(hof.withColumnRenamed("text", "b"), "doc_id")
            .where(F.col("a") != F.col("b")).count())
    print(f"HOF-vs-join mismatched docs: {diff}", flush=True)

    # ---- pieces 1+2: b24 ingest ---------------------------------------
    sys.path.insert(0, "/root/repo")
    import bench
    warc_dir = bench.prepare_warc_dir(spark, docs)
    from deequ_spark.llm.warc import crawl_to_corpus, read_warc, \
        wet_documents

    wet = wet_documents(read_warc(spark, warc_dir,
                                  warc_types={"conversion"}))
    timed(spark, "WARC parse alone (noop)", lambda: noop(wet))

    def b24_shipped():
        chunks, _ = crawl_to_corpus(spark, warc_dir, source="wet",
                                    min_words=20, quality_filter=False,
                                    collect_stats=False)
        n = chunks.count()
        chunks.unpersist()
        return n

    timed(spark, "b24 shipped (uncut input)", b24_shipped)

    def b24_cut_input():
        from deequ_spark.llm.pipeline import prepare_training_corpus
        d = wet.select(
            F.xxhash64(F.col("url"), F.col("text")).alias("doc_id"),
            "url", "text").localCheckpoint(eager=False)
        chunks, _ = prepare_training_corpus(
            d, "doc_id", "text", min_words=20, quality_filter=False,
            collect_stats=False)
        n = chunks.count()
        chunks.unpersist()
        d.unpersist()
        return n

    timed(spark, "b24 with input localCheckpoint", b24_cut_input)

    import shutil
    shutil.rmtree(warc_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
