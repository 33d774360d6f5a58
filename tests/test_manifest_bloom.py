"""Per-file Bloom skipping in the manifest layer (sources.py
add_bloom_to_manifest / file_misses_key / read_corpus prune_eq) and the
pure-Python xxhash64 replica it probes with (deequ_spark/xxh64.py)."""

import random

import pytest
from pyspark.sql import functions as F

from deequ_spark.sources import (add_bloom_to_manifest, file_misses_key,
                                 read_corpus, write_manifest)


class TestXxh64Parity:
    """The driver-side probe is only sound if the Python hash is
    bit-identical to Spark's executor-side xxhash64."""

    def test_longs_ints_strings_and_chains(self, spark):
        from deequ_spark.xxh64 import spark_xxhash64
        rng = random.Random(11)
        longs = ([rng.randrange(-2**63, 2**63 - 1) for _ in range(40)]
                 + [0, -1, 1, 2**62, -2**63, 2**63 - 1])
        strs = ["", "a", "abc", "x" * 4, "x" * 8, "x" * 31, "x" * 32,
                "x" * 33, "x" * 100, "émoji ✓ ünïcode", "\x00tail"]
        rows = [(i, v, strs[i % len(strs)])
                for i, v in enumerate(longs)]
        df = spark.createDataFrame(rows, "i int, v long, s string")
        got = df.select(
            "i", "v", "s",
            F.xxhash64("v").alias("hv"),
            F.xxhash64("s").alias("hs"),
            F.xxhash64("i").alias("hi"),
            F.xxhash64("v", F.lit(0x9E3779B9)).alias("hchain"),
            F.xxhash64("s", "v").alias("hmix")).collect()
        for r in got:
            assert spark_xxhash64(r["v"]) == r["hv"]
            assert spark_xxhash64(r["s"]) == r["hs"]
            assert spark_xxhash64(("int", r["i"])) == r["hi"]
            assert spark_xxhash64(r["v"], 0x9E3779B9) == r["hchain"]
            assert spark_xxhash64(r["s"], r["v"]) == r["hmix"]

    def test_python_probe_matches_spark_expression(self, spark):
        from deequ_spark.bloom import (bloom_contains_py, build_bloom,
                                       bloom_might_contain)
        members = spark.createDataFrame(
            [(i * 13 + 1,) for i in range(2000)], "k long")
        bloom = build_bloom(members, "k")
        probe = spark.createDataFrame(
            [(i,) for i in range(0, 30000, 7)], "k long")
        spark_side = {r["k"]: r["hit"] for r in probe.select(
            "k", bloom_might_contain(bloom, F.col("k")).alias("hit"))
            .collect()}
        for k, hit in spark_side.items():
            assert bloom_contains_py(bloom, k) == hit
        assert bloom_contains_py(bloom, None) is None


@pytest.fixture(scope="module")
def scattered_corpus(spark, tmp_path_factory):
    """The layout where min/max is USELESS: custkey hash-scattered
    across files, so every file's [min, max] spans ~everything and only
    the Bloom bits can prune a point lookup."""
    d = str(tmp_path_factory.mktemp("bloomman") / "c")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    orders.repartition(12, "o_orderkey").write.parquet(d)
    write_manifest(spark, d, ["o_custkey"])
    add_bloom_to_manifest(spark, d, "o_custkey")
    return d, orders


class TestManifestBloomSkipping:
    def test_minmax_cannot_prune_but_bloom_does(self, spark,
                                                scattered_corpus):
        d, orders = scattered_corpus
        man = spark.read.parquet(f"{d}/_manifest").collect()
        # pick a custkey that lives in few orders
        key = orders.groupBy("o_custkey").count().orderBy("count") \
            .limit(1).collect()[0]["o_custkey"]
        from deequ_spark.sources import file_misses_range
        range_pruned = sum(file_misses_range(r, "o_custkey", key, key)
                           for r in man)
        bloom_pruned = sum(file_misses_key(r, "o_custkey", key)
                           for r in man)
        assert range_pruned == 0, "hash scatter defeats min/max (setup)"
        assert bloom_pruned > 0, "bloom must prune where min/max can't"

    def test_point_lookup_rows_exact_over_sweep(self, spark,
                                                scattered_corpus):
        d, orders = scattered_corpus
        rng = random.Random(5)
        for _ in range(15):
            key = rng.randrange(1, 1500)
            got = read_corpus(spark, d,
                              prune_eq={"o_custkey": key}).count()
            want = orders.where(F.col("o_custkey") == key).count()
            assert got == want, f"key {key}: {got} vs {want}"

    def test_absent_key_reads_nothing_or_fp_files_only(self, spark,
                                                       scattered_corpus):
        d, _ = scattered_corpus
        assert read_corpus(spark, d,
                           prune_eq={"o_custkey": 10**9}).count() == 0

    def test_combined_range_and_eq_pruning(self, spark,
                                           scattered_corpus):
        d, orders = scattered_corpus
        got = read_corpus(spark, d, prune={"o_custkey": (100, 200)},
                          prune_eq={"o_custkey": 150}).count()
        assert got == orders.where(F.col("o_custkey") == 150).count()

    def test_manifest_without_bloom_still_reads_exact(self, spark,
                                                      tmp_path):
        d = str(tmp_path / "plain")
        orders = spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet")
        orders.repartition(4).write.parquet(d)
        write_manifest(spark, d, ["o_custkey"])   # no bloom attached
        got = read_corpus(spark, d, prune_eq={"o_custkey": 7}).count()
        assert got == orders.where(F.col("o_custkey") == 7).count()

    def test_string_key_bloom(self, spark, tmp_path):
        d = str(tmp_path / "s")
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet") \
            .select("doc_id", "source", "lang")
        docs.repartition(6, "doc_id").write.parquet(d)
        write_manifest(spark, d, ["source"])
        add_bloom_to_manifest(spark, d, "source")
        src = docs.limit(1).collect()[0]["source"]
        got = read_corpus(spark, d, prune_eq={"source": src}).count()
        assert got == docs.where(F.col("source") == src).count()
        assert read_corpus(spark, d,
                           prune_eq={"source": "no-such-src"}).count() == 0
