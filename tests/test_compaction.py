"""Small-file compaction (sources.py compact_corpus): content-exact
rewrites, tail-proportional work, partition-dir safety, manifest
refresh, idempotence."""

import glob

import pytest
from pyspark.sql import functions as F

from deequ_spark.sources import (compact_corpus, read_corpus,
                                 write_manifest)


def _cents_sig(df):
    return tuple(df.agg(
        F.count(F.lit(1)),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")),
        F.sum("o_orderkey")).collect()[0])


class TestCompaction:
    def test_flat_corpus_content_exact(self, spark, tmp_path):
        d = str(tmp_path / "c")
        orders = spark.read.parquet(
            "/root/testdata/sf0.01/orders.parquet")
        orders.repartition(40).write.parquet(d)
        write_manifest(spark, d, ["o_custkey"])
        before = _cents_sig(orders)
        res = compact_corpus(spark, d, target_bytes=1_000_000)
        assert res["bins"] >= 1
        assert res["files_after"] < res["files_before"]
        after_df = spark.read.parquet(d)
        assert _cents_sig(after_df) == before
        # row multiset identical, not just aggregates
        assert after_df.exceptAll(orders).count() == 0
        assert orders.exceptAll(after_df).count() == 0
        # physical file count matches the report
        assert len(glob.glob(f"{d}/*.parquet")) == res["files_after"]
        # manifest refreshed: ghosts dropped, totals preserved
        man = spark.read.parquet(f"{d}/_manifest")
        assert man.count() == res["files_after"]
        assert man.agg(F.sum("n_rows")).collect()[0][0] == before[0]
        # pruning still exact through the refreshed manifest
        got = read_corpus(spark, d, prune={"o_custkey": (50, 90)}).count()
        assert got == orders.where("o_custkey between 50 and 90").count()

    def test_idempotent_second_pass(self, spark, tmp_path):
        d = str(tmp_path / "c2")
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
            .repartition(10).write.parquet(d)
        first = compact_corpus(spark, d, target_bytes=10_000_000)
        second = compact_corpus(spark, d, target_bytes=10_000_000)
        assert first["bins"] >= 1
        assert second["bins"] == 0 and second["bytes_compacted"] == 0

    def test_right_sized_files_untouched(self, spark, tmp_path):
        d = str(tmp_path / "c3")
        spark.read.parquet("/root/testdata/sf0.01/orders.parquet") \
            .repartition(4).write.parquet(d)
        before_files = sorted(glob.glob(f"{d}/*.parquet"))
        # target small enough that every existing file counts as big
        res = compact_corpus(spark, d, target_bytes=50_000)
        assert res["bins"] == 0
        assert sorted(glob.glob(f"{d}/*.parquet")) == before_files

    def test_hive_partitions_compact_within_dirs(self, spark, tmp_path):
        d = str(tmp_path / "p")
        docs = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet") \
            .select("doc_id", "n_chars", "lang")
        docs.repartition(8).write.partitionBy("lang").parquet(d)
        res = compact_corpus(spark, d, target_bytes=5_000_000)
        assert res["bins"] >= 1
        back = spark.read.parquet(d)
        # partition column still directory-derived and correct
        assert back.count() == docs.count()
        assert (back.groupBy("lang").count().exceptAll(
            docs.groupBy("lang").count()).count() == 0)
        # no bin crossed a partition dir: every compacted file lives
        # inside a lang= dir and decodes that lang only
        for f in glob.glob(f"{d}/lang=*/compacted-*.parquet"):
            lang = f.split("lang=")[1].split("/")[0]
            rows = spark.read.parquet(f"file:{f}").count()
            assert rows > 0
            got = spark.read.option("basePath", d) \
                .parquet(f"file:{f}") \
                .where(F.col("lang") == lang).count()
            assert got == rows
