"""Capture .explain('formatted') for the r13-touched query paths.

Usage: python tools/capture_plans_r13.py <repo_root> <out_dir> <suffix> [only]

Same harness as tools/capture_plans_r12.py: run once against the
pre-optimization worktree (suffix 'before') and once against HEAD
(suffix 'after'); executed-plan node counts are appended where the
claim is about execution shape.

r13 captures:
  * b4_histogram_freq — the standalone Histogram's frequency-table
    subtree. BEFORE: its own corpus groupBy (parquet scan + Exchange).
    AFTER: the string-cast re-aggregation over the bucket's persisted
    null-inclusive table (InMemoryTableScan, no parquet scan).
  * b4_bucket_freq — the grouping bucket's frequency table. BEFORE:
    frequencies_plan (null-excluding scan+shuffle). AFTER: the filtered
    view over the same shared cached table.
  * b17_span_dedup — duplicate_span_removal full output.
  * b27 pipeline captures are added as wave 2 lands.
"""

from __future__ import annotations

import os
import re
import sys

REPO, OUT_DIR, SUFFIX = sys.argv[1], sys.argv[2], sys.argv[3]
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def write(name: str, df, execute: bool = False) -> None:
    if ONLY is not None and name not in ONLY:
        return
    path = os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt")
    text = explain_str(df)
    if execute:
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        counts = {node: len(re.findall(node, plan))
                  for node in ("Exchange", "ReusedExchange", "Subquery",
                               "BroadcastHashJoin", "SortMergeJoin",
                               "InMemoryTableScan", "Scan parquet",
                               "ArrowEvalPython", "BatchEvalPython")}
        text += "\n\n== Executed-plan node counts (final adaptive) ==\n"
        text += "".join(f"{k}: {v}\n" for k, v in counts.items())
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote {path}", flush=True)


def main():
    spark = (SparkSession.builder.master("local[8]")
             .appName(f"plans-r13-{SUFFIX}")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    os.chdir(REPO)

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def wanted(*names):
        return ONLY is None or any(n in ONLY for n in names)

    if wanted("b4_histogram_freq", "b4_bucket_freq"):
        from deequ_spark.analyzers.grouping import Histogram, frequencies_plan
        hist = Histogram("l_returnflag")
        try:
            from deequ_spark.analyzers.grouping import (
                exclude_all_null_groups, frequencies_plan_all)
            shared = True
        except ImportError:          # pre-r13 tree: no sharing helpers
            shared = False
        if shared:
            from pyspark.storagelevel import StorageLevel
            from deequ_spark.analyzers.grouping import (COUNT_COL,
                                                        NULL_FIELD_REPLACEMENT)
            freq_incl = frequencies_plan_all(lineitem, ["l_returnflag"]) \
                .persist(StorageLevel.MEMORY_AND_DISK)
            freq_incl.count()        # materialize, as the bucket task does
            bucket = exclude_all_null_groups(freq_incl, ["l_returnflag"])
            derived = (freq_incl.select(
                F.coalesce(F.col("`l_returnflag`").cast("string"),
                           F.lit(NULL_FIELD_REPLACEMENT))
                .alias("l_returnflag"),
                F.col(COUNT_COL))
                .groupBy(F.col("`l_returnflag`"))
                .agg(F.sum(COUNT_COL).cast("long").alias(COUNT_COL)))
            write("b4_bucket_freq", bucket, execute=True)
            write("b4_histogram_freq", derived, execute=True)
            freq_incl.unpersist()
        else:
            bucket = frequencies_plan(lineitem, ["l_returnflag"])
            write("b4_bucket_freq", bucket, execute=True)
            write("b4_histogram_freq",
                  hist.compute_state_from(lineitem).frequencies,
                  execute=True)

    if wanted("b17_span_dedup"):
        from deequ_spark.llm import duplicate_span_removal
        out = duplicate_span_removal(docs, "doc_id", "text", n=4)
        write("b17_span_dedup",
              out.select("doc_id", "deduped", "n_tokens",
                         "n_removed_tokens"),
              execute=True)

    spark.stop()


if __name__ == "__main__":
    main()
