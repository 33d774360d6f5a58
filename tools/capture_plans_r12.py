"""Capture .explain('formatted') for the r12-touched query paths.

Usage: python tools/capture_plans_r12.py <repo_root> <out_dir> <suffix> [only]

`only` (optional): comma-separated capture names — restricts the run to
that subset (e.g. "b6_lsh_verified,b8_text_gopher,text_normalize").

Runs each touched operator's central DataFrame through
explain('formatted') using the code at <repo_root> and writes
<out_dir>/<name>_<suffix>.txt — run once against the pre-optimization
worktree (suffix 'before') and once against HEAD (suffix 'after').
Executed-plan node counts (Exchange / ReusedExchange / Subquery) are
appended for the plans where the claim is about execution shape.
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
                               "ArrowEvalPython", "BatchEvalPython")}
        text += "\n\n== Executed-plan node counts (final adaptive) ==\n"
        text += "".join(f"{k}: {v}\n" for k, v in counts.items())
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote {path}", flush=True)


def main():
    spark = (SparkSession.builder.master("local[8]")
             .appName(f"plans-r12-{SUFFIX}")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    sys.path.insert(0, REPO)
    os.chdir(REPO)
    import bench

    def wanted(*names):
        return ONLY is None or any(n in ONLY for n in names)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    path = None
    if wanted("b22_incremental_dedup"):
        # --- b22: incremental-dedup classify (bloom gate + sliver) ----
        idx_pair = bench.prepare_dedup_index(spark, docs)
        path, batch = idx_pair
        from deequ_spark.llm.incremental import dedup_against_index
        _, dups = dedup_against_index(batch, "doc_id", "text", path,
                                      threshold=0.5)
        write("b22_incremental_dedup", dups, execute=True)

    from deequ_spark.llm.dedup import (minhash_lsh_pairs,
                                       near_duplicate_components)
    if wanted("b6_lsh_candidates"):
        # --- b6: minhash LSH candidate pairs --------------------------
        cand = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8,
                                 num_hashes=64, bands=32, shingle_n=3,
                                 verify_exact=False)
        write("b6_lsh_candidates", cand, execute=True)

    if wanted("b6_lsh_verified"):
        # --- b6 verify subtree: checkpoint patched to identity so the
        # full logical chain (candidates -> cand_ids -> shingle re-join ->
        # pair join) is visible in one explain --------------------------
        DF = type(docs)
        orig_lc = DF.localCheckpoint
        DF.localCheckpoint = lambda self, eager=True: self
        try:
            ver = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8,
                                    num_hashes=64, bands=32, shingle_n=3)
            write("b6_lsh_verified", ver, execute=True)
        finally:
            DF.localCheckpoint = orig_lc

    if wanted("b6_lsh_verify_cached"):
        # --- b6 verify subtree with the internal caches VISIBLE: the
        # identity-patched localCheckpoint above also skips the eager
        # materialization, so minhash_lsh_pairs' own unpersist() calls
        # would drop the caches before explain/execute ever sees them.
        # No-op unpersist too, so the captured plan shows exactly what
        # the real (checkpoint-materialized) execution reads: the
        # persisted subtrees as InMemoryTableScan instead of a second
        # full computation of the candidate/shingle passes. -------------
        DF = type(docs)
        orig_lc = DF.localCheckpoint
        orig_up = DF.unpersist
        DF.localCheckpoint = lambda self, eager=True: self
        DF.unpersist = lambda self, blocking=False: self
        try:
            ver = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8,
                                    num_hashes=64, bands=32, shingle_n=3)
            write("b6_lsh_verify_cached", ver, execute=True)
        finally:
            DF.localCheckpoint = orig_lc
            DF.unpersist = orig_up
            spark.catalog.clearCache()

    if wanted("near_dedup_components"):
        # --- near-dup connected components (distributed shape) --------
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "id_a long, id_b long")
        comp = near_duplicate_components(pairs)
        write("near_dedup_components", comp, execute=False)

    if wanted("b11_embedding_near_dup"):
        # --- b11: embedding near-dup ----------------------------------
        from deequ_spark.llm.dedup import embedding_near_duplicates
        epairs = embedding_near_duplicates(emb, "vec_id", "embedding",
                                           threshold=0.9, auto_tune=True)
        write("b11_embedding_near_dup", epairs, execute=True)

    if wanted("b8_text_gopher"):
        # --- gopher quality flags (stop_hits / alpha_ratio exprs) -----
        from deequ_spark.llm import gopher_quality_flags
        flagged = gopher_quality_flags(docs, "text", min_words=20)
        write("b8_text_gopher", flagged, execute=True)

    if wanted("text_normalize"):
        # --- normalize_text (whitespace-collapse regex chain) ---------
        from deequ_spark.llm import normalize_text
        cleaned = normalize_text(docs, "text")
        write("text_normalize", cleaned, execute=True)

    if wanted("boilerplate_rebuild"):
        # --- remove_boilerplate_lines, pipeline projection (id +
        # cleaned): wave 3 replaces the explode/anti-join/groupBy(id)
        # reassembly with a per-row HOF filter against the boiler set
        # (scalar subquery), size-gated -------------------------------
        from deequ_spark.llm import remove_boilerplate_lines
        bp = remove_boilerplate_lines(docs.select("doc_id", "text"),
                                      "doc_id", "text", min_docs=2)
        write("boilerplate_rebuild",
              bp.select("doc_id", F.col("cleaned").alias("text")),
              execute=True)

    spark.stop()
    if path is not None:
        import shutil
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
