"""AB: Bloom pre-filter on the incremental-dedup classify join (r12).

dedup_against_index's exact path joins the new batch's fingerprints
against the persisted fps table. r12 persists the index's fingerprint
Bloom bits (llm/incremental.py fps_bloom) and pre-filters the batch
with bloom_might_contain BEFORE that join — a mostly-fresh crawl batch
ships only its bloom-positive sliver into the exchange.

Measured here, AB_B28-method: the metric that matters at 100 TB is
JOIN-INPUT ROWS (the batch rows entering the fps join's exchange), at
1x and 10x index size, plus the classification-identity check (bloom
on vs bloom off must classify every doc the same) and honest warm
wall-clock medians. Writes tools/AB_BLOOM_DEDUP_NOTE.md numbers.

Usage: python tools/ab_bloom_dedup.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deequ_spark.bloom import bloom_might_contain
from deequ_spark.llm import dedup_against_index, write_dedup_index
from deequ_spark.llm.incremental import _read_fps_bloom
from deequ_spark.llm.text import fingerprint

BATCH = 5000
DUP_SHARE = 0.10          # 10% of the batch repeats history


def corpus(spark, n, tag):
    """n distinct documents, 12 words each, disjoint across tags."""
    return spark.range(n).select(
        (F.col("id") + 1).alias("doc_id"),
        F.concat_ws(" ", *[
            F.format_string(f"{tag}%d", (F.col("id") * 31 + i) % (n * 13))
            for i in range(12)]).alias("text"))


def batch_df(spark, index_docs, n_index):
    n_dup = int(BATCH * DUP_SHARE)
    dups = (index_docs.where(F.col("doc_id") % (n_index // n_dup) == 1)
            .limit(n_dup)
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                    "text"))
    fresh = corpus(spark, BATCH - n_dup, "fresh").select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text")
    return dups.unionByName(fresh).localCheckpoint(eager=True)


def run(spark, scale):
    n_index = 20_000 * scale
    idx = tempfile.mkdtemp(prefix=f"ab_bloom_idx_{scale}x_")
    try:
        index_docs = corpus(spark, n_index, "hist")
        write_dedup_index(index_docs, "doc_id", "text", idx)
        batch = batch_df(spark, index_docs, n_index)

        bloom = _read_fps_bloom(spark, idx)
        fp = batch.select(fingerprint(F.col("text")).alias("f"))
        join_in_plain = fp.count()
        join_in_bloom = fp.where(F.coalesce(
            bloom_might_contain(bloom, F.col("f")), F.lit(False))).count()

        def classify():
            # use_bloom=True: this AB measures the probe itself, so the
            # r12 adaptive size gate (which would skip it at 20k/200k
            # keys) is overridden; the off leg moves fps_bloom away,
            # which wins over the flag (no bits to probe)
            fresh, dups = dedup_against_index(
                batch, "doc_id", "text", idx, threshold=0.8,
                use_bloom=True)
            return (sorted(r["doc_id"] for r in fresh.collect()),
                    sorted((r["id"], r["match_kind"], r["matched_id"])
                           for r in dups.collect()))

        ts_on, ts_off = [], []
        res_on = res_off = None
        for _ in range(3):                       # interleaved warm reps
            t = time.time()
            res_on = classify()
            ts_on.append(time.time() - t)
            shutil.move(f"{idx}/fps_bloom", f"{idx}/_fps_bloom_off")
            t = time.time()
            res_off = classify()
            ts_off.append(time.time() - t)
            shutil.move(f"{idx}/_fps_bloom_off", f"{idx}/fps_bloom")
        assert res_on == res_off, "bloom changed classifications!"
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        return {"scale": scale, "index_docs": n_index, "batch": BATCH,
                "join_in_plain": join_in_plain,
                "join_in_bloom": join_in_bloom,
                "reduction": join_in_plain / max(join_in_bloom, 1),
                "bloom_n": bloom["n"], "bloom_m": bloom["m"],
                "classify_s_on": round(med(ts_on), 2),
                "classify_s_off": round(med(ts_off), 2),
                "identical": res_on == res_off}
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "6g")
             .appName("ab-bloom-dedup").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for scale in (1, 10):
        print(run(spark, scale))


if __name__ == "__main__":
    main()
