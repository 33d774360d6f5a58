"""optimize_corpus (sources.py): the single incremental maintenance
pass — cluster+compact the unoptimized tail, pinned curve bounds,
incremental manifest + Bloom refresh — plus the update_manifest
NULL-padding contract for manifests that carry bloom columns."""

import pytest
from pyspark.sql import functions as F

from deequ_spark.sources import (CLUSTERED_PREFIX, add_bloom_to_manifest,
                                 optimize_corpus, read_corpus,
                                 update_manifest, write_manifest)


def _sig(df):
    return tuple(df.agg(
        F.count(F.lit(1)),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")),
        F.sum("o_orderkey")).collect()[0])


@pytest.fixture()
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.01/orders.parquet")


class TestOptimizeCorpus:
    def test_full_pass_content_exact_and_layout(self, spark, tmp_path,
                                                orders):
        d = str(tmp_path / "c")
        orders.repartition(12).write.parquet(d)
        want = _sig(orders)
        res = optimize_corpus(spark, d,
                              cluster_by=["o_custkey", "o_totalprice"],
                              bloom_cols=["o_custkey"],
                              target_bytes=8 * 1024 * 1024)
        after = spark.read.parquet(d)
        assert _sig(after) == want                       # nothing lost
        assert res["files_after"] < res["files_before"]
        names = [f.rsplit("/", 1)[-1] for f in after.inputFiles()]
        assert all(n.startswith(CLUSTERED_PREFIX) for n in names)
        # manifest + bloom landed and prune exactly
        lo, hi = 100, 300
        got = read_corpus(spark, d,
                          prune={"o_custkey": (lo, hi)}).count()
        want_n = orders.where(F.col("o_custkey").between(lo, hi)).count()
        assert got == want_n
        key = orders.select("o_custkey").first()[0]
        got_eq = read_corpus(spark, d, prune_eq={"o_custkey": key})
        assert got_eq.count() == orders.where(
            F.col("o_custkey") == key).count()

    def test_second_pass_is_a_no_op(self, spark, tmp_path, orders):
        d = str(tmp_path / "c")
        orders.repartition(12).write.parquet(d)
        optimize_corpus(spark, d, cluster_by=["o_custkey"],
                        bloom_cols=["o_custkey"],
                        target_bytes=8 * 1024 * 1024)
        res2 = optimize_corpus(spark, d, cluster_by=["o_custkey"],
                               bloom_cols=["o_custkey"],
                               target_bytes=8 * 1024 * 1024)
        assert res2["rewritten"] == 0                  # nothing re-read
        assert res2["manifest"]["scanned"] == 0
        assert res2["blooms"]["o_custkey"]["scanned"] == 0

    def test_incremental_append_touches_only_new_files(
            self, spark, tmp_path, orders):
        d = str(tmp_path / "c")
        half1 = orders.where(F.col("o_orderkey") % 2 == 0)
        half2 = orders.where(F.col("o_orderkey") % 2 == 1)
        half1.repartition(10).write.parquet(d)
        optimize_corpus(spark, d,
                        cluster_by=["o_custkey", "o_totalprice"],
                        bloom_cols=["o_custkey"],
                        target_bytes=8 * 1024 * 1024)
        n_clustered = len(spark.read.parquet(d).inputFiles())
        half2.repartition(7).write.mode("append").parquet(d)
        res = optimize_corpus(spark, d,
                              cluster_by=["o_custkey", "o_totalprice"],
                              bloom_cols=["o_custkey"],
                              target_bytes=8 * 1024 * 1024)
        # only the 7 appended files (and possibly small clustered
        # leftovers) were rewritten — never the right-sized majority
        assert 7 <= res["rewritten"] <= 7 + n_clustered
        # manifest + bloom scans proportional to the new files
        assert res["manifest"]["scanned"] == res["clustered_files"]
        assert res["blooms"]["o_custkey"]["scanned"] \
            == res["clustered_files"]
        assert _sig(spark.read.parquet(d)) == _sig(orders)
        key = orders.select("o_custkey").first()[0]
        got = read_corpus(spark, d, prune_eq={"o_custkey": key}).count()
        assert got == orders.where(F.col("o_custkey") == key).count()

    def test_hive_partitions_stay_directory_encoded(self, spark,
                                                    tmp_path, orders):
        d = str(tmp_path / "c")
        (orders.withColumn("bucket", F.col("o_orderkey") % 3)
         .repartition(9).write.partitionBy("bucket").parquet(d))
        res = optimize_corpus(spark, d, cluster_by=["o_custkey"],
                              target_bytes=8 * 1024 * 1024)
        after = spark.read.parquet(d)
        assert res["files_after"] <= res["files_before"]
        assert after.count() == orders.count()
        per = {r["bucket"]: r["n"] for r in
               after.groupBy("bucket").agg(F.count("*").alias("n"))
               .collect()}
        want = {r["b"]: r["n"] for r in
                orders.select((F.col("o_orderkey") % 3).alias("b"))
                .groupBy("b").agg(F.count("*").alias("n")).collect()}
        assert per == want

    def test_without_cluster_by_delegates_to_compaction(
            self, spark, tmp_path, orders):
        d = str(tmp_path / "c")
        orders.repartition(10).write.parquet(d)
        res = optimize_corpus(spark, d, bloom_cols=["o_custkey"],
                              target_bytes=32 * 1024 * 1024)
        assert res["files_after"] < res["files_before"]
        assert _sig(spark.read.parquet(d)) == _sig(orders)


class TestUpdateManifestWithBloomColumns:
    def test_new_files_pad_null_blooms_then_fill_incrementally(
            self, spark, tmp_path, orders):
        d = str(tmp_path / "c")
        orders.repartition(5).write.parquet(d)
        write_manifest(spark, d, "o_custkey")
        add_bloom_to_manifest(spark, d, "o_custkey")
        orders.limit(100).repartition(2).write.mode("append").parquet(d)
        res = update_manifest(spark, d, "o_custkey")
        assert res["scanned"] == 2
        man = spark.read.parquet(f"{d}/_manifest")
        assert man.where(F.col("bloom_o_custkey").isNull()).count() == 2
        res2 = add_bloom_to_manifest(spark, d, "o_custkey")
        assert res2["scanned"] == 2                   # only the gaps
        man2 = spark.read.parquet(f"{d}/_manifest")
        assert man2.where(F.col("bloom_o_custkey").isNull()).count() == 0
        key = orders.select("o_custkey").first()[0]
        got = read_corpus(spark, d, prune_eq={"o_custkey": key}).count()
        want = (orders.where(F.col("o_custkey") == key).count()
                + orders.limit(100)
                .where(F.col("o_custkey") == key).count())
        assert got == want
