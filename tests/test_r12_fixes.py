"""r11 ADVICE regressions: Bloom key-type canonicalization (int vs
long xxhash64 divergence → silent data loss), compact_corpus rename
failure handling, add_bloom_to_manifest idempotency, and the tar ustar
prefix gate."""

import io

import pytest
from pyspark.sql import functions as F

from deequ_spark.bloom import (bloom_anti_join, bloom_contains_py,
                               bloom_might_contain, bloom_semi_join,
                               build_bloom)
from deequ_spark.sources import (add_bloom_to_manifest, compact_corpus,
                                 file_misses_key, read_corpus,
                                 write_manifest)


class TestBloomKeyTypeCanonicalization:
    """xxhash64 hashes an int and a long of the same value differently;
    every build/probe pair must go through one canonical type."""

    def test_build_over_int_column_probes_like_long(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], "k int")
        bloom = build_bloom(df, "k")
        assert bloom["type"] == "long"
        # driver probe (hashes Python ints as longs) sees every member
        assert all(bloom_contains_py(bloom, v) for v in range(2000))
        # expression probe over a LONG column sees every member too
        longs = spark.createDataFrame([(i,) for i in range(2000)],
                                      "k long")
        n = longs.where(bloom_might_contain(bloom, F.col("k"))).count()
        assert n == 2000

    @pytest.mark.parametrize("big_t,small_t", [
        ("int", "long"), ("long", "int"), ("smallint", "bigint")])
    def test_semi_join_mixed_integral_widths_exact(self, spark,
                                                   big_t, small_t):
        big = spark.createDataFrame(
            [(i, i % 500) for i in range(4000)],
            f"row_id long, k {big_t}")
        small = spark.createDataFrame([(i * 3,) for i in range(100)],
                                      f"k {small_t}")
        got = bloom_semi_join(big, small, "k").select("row_id")
        want = big.join(small, "k", "left_semi").select("row_id")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        assert got.count() > 0          # the bug dropped ALL matches

    def test_anti_join_mixed_widths_exact(self, spark):
        big = spark.createDataFrame(
            [(i, i % 500) for i in range(4000)], "row_id long, k int")
        small = spark.createDataFrame([(i * 3,) for i in range(100)],
                                      "k long")
        got = bloom_anti_join(big, small, "k").select("row_id")
        want = big.join(small, "k", "left_anti").select("row_id")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_long_vs_string_keys_raise(self, spark):
        big = spark.createDataFrame([(1, 7)], "row_id long, k long")
        small = spark.createDataFrame([("7",)], "k string")
        with pytest.raises(TypeError, match="diverge"):
            bloom_semi_join(big, small, "k")

    def test_unsupported_key_type_raises_at_build(self, spark):
        df = spark.createDataFrame([(1.5,)], "k double")
        with pytest.raises(TypeError, match="unsupported"):
            build_bloom(df, "k")

    def test_probe_value_type_mismatch_is_unknown_not_error(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], "k long")
        bloom = build_bloom(df, "k")
        assert bloom_contains_py(bloom, "7") is None       # str vs long
        assert bloom_contains_py(bloom, 5.5) is None       # frac float
        assert bloom_contains_py(bloom, True) is None      # bool
        assert bloom_contains_py(bloom, 7.0) is True       # 7.0 == 7
        sbloom = build_bloom(
            spark.createDataFrame([("a",)], "k string"), "k")
        assert bloom_contains_py(sbloom, 7) is None        # int vs str


class TestManifestBloomIntColumn:
    """The data-loss shape: bits built executor-side over an INT column
    were probed driver-side with the long fast path — certain-miss on
    files that contain the key."""

    def _corpus(self, spark, tmp_path, coltype):
        d = str(tmp_path / "c")
        df = spark.createDataFrame(
            [(i, f"p{i % 7}") for i in range(5000)],
            f"k {coltype}, payload string")
        df.repartition(8).write.parquet(d)
        write_manifest(spark, d, "k")
        add_bloom_to_manifest(spark, d, "k")
        return d

    @pytest.mark.parametrize("coltype", ["int", "smallint", "bigint"])
    def test_prune_eq_exact_on_integral_columns(self, spark, tmp_path,
                                                coltype):
        d = self._corpus(spark, tmp_path, coltype)
        for key in (0, 17, 4999):
            got = read_corpus(spark, d, prune_eq={"k": key}).count()
            assert got == 1, f"{coltype} key {key}: lost the row"

    def test_manifest_records_canonical_type(self, spark, tmp_path):
        d = self._corpus(spark, tmp_path, "int")
        man = spark.read.parquet(f"{d}/_manifest")
        assert "bloom_k_type" in man.columns
        assert man.select("bloom_k_type").distinct().collect()[0][0] \
            == "long"

    def test_unsupported_column_rejected_at_build(self, spark, tmp_path):
        d = str(tmp_path / "f")
        spark.createDataFrame([(1.5, "x")], "k double, payload string") \
            .write.parquet(d)
        write_manifest(spark, d, "k")
        with pytest.raises(TypeError, match="unsupported"):
            add_bloom_to_manifest(spark, d, "k")

    def test_file_misses_key_never_raises_on_odd_values(self, spark,
                                                        tmp_path):
        d = self._corpus(spark, tmp_path, "int")
        man = spark.read.parquet(f"{d}/_manifest").collect()
        # a string probe against an int column: incomparable for the
        # range check, unhashable for the bloom — unknown, not pruned,
        # and (the r11 bug) definitely no TypeError mid-read
        assert file_misses_key(man[0], "k", "7") is False
        # a fractional float INSIDE the file's range: range can't
        # prune it, and the bloom must answer unknown, not probe the
        # long path with a non-integral value
        inside = float(man[0]["min_k"]) + 0.5
        assert file_misses_key(man[0], "k", inside) is False
        # bool compares as 1 in Python AND casts to 1 in Spark, so a
        # RANGE prune may legitimately fire; it just must not raise
        assert isinstance(file_misses_key(man[0], "k", True), bool)

    def test_add_bloom_idempotent(self, spark, tmp_path):
        d = self._corpus(spark, tmp_path, "bigint")
        add_bloom_to_manifest(spark, d, "k")        # second run
        man = spark.read.parquet(f"{d}/_manifest")
        assert man.columns.count("bloom_k") == 1
        assert man.columns.count("bloom_k_k") == 1
        assert read_corpus(spark, d, prune_eq={"k": 17}).count() == 1


class TestCompactionRenameFailure:
    def test_failed_rename_aborts_before_deleting_originals(
            self, spark, tmp_path, monkeypatch):
        import deequ_spark.sources as src
        d = str(tmp_path / "c")
        df = spark.createDataFrame(
            [(i, "x" * 50) for i in range(1000)], "k long, s string")
        df.repartition(6).write.parquet(d)
        before = sorted(spark.read.parquet(d).inputFiles())
        n_before = spark.read.parquet(d).count()
        monkeypatch.setattr(src, "_fs_rename", lambda fs, a, b: False)
        with pytest.raises(IOError, match="rename"):
            compact_corpus(spark, d, target_bytes=1 << 20)
        # nothing lost, nothing moved: original files and rows intact
        assert sorted(spark.read.parquet(d).inputFiles()) == before
        assert spark.read.parquet(d).count() == n_before


class TestUstarGateExactMagic:
    def test_gnu_header_with_atime_gets_no_prefix(self, spark):
        """An oldgnu header stores atime at offset 345 — the POSIX
        prefix field's offset. The gate must exclude GNU magic
        ('ustar  \\0') so those octal digits never prepend to names."""
        from deequ_spark.llm import webdataset_index
        body = b"gnu body"
        hdr = bytearray(512)
        hdr[0:9] = b"0.txt\x00\x00\x00\x00"               # name
        hdr[100:108] = b"0000644\x00"                      # mode
        hdr[108:116] = b"0000000\x00"                      # uid
        hdr[116:124] = b"0000000\x00"                      # gid
        hdr[124:136] = b"%011o\x00" % len(body)            # size
        hdr[136:148] = b"%011o\x00" % 0                    # mtime
        hdr[148:156] = b" " * 8                            # chksum spc
        hdr[156] = ord("0")                                # typeflag
        hdr[257:265] = b"ustar  \x00"                      # GNU magic
        hdr[345:357] = b"%011o\x00" % 12345678             # atime!
        chk = sum(hdr)
        hdr[148:156] = b"%06o\x00 " % chk
        pad = (512 - len(body) % 512) % 512
        tar = bytes(hdr) + body + b"\0" * pad + b"\0" * 1024
        df = spark.createDataFrame([("t", bytearray(tar))],
                                   "path string, content binary")
        rows = webdataset_index(df).collect()
        assert [r["member"] for r in rows] == ["0.txt"]
