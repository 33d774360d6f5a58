"""WebDataset tar shards (deequ_spark/llm/shards.py): round trip,
determinism, manifest accounting, binary columns, null skipping."""

import io
import tarfile

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deequ_spark.llm import read_webdataset, write_webdataset


@pytest.fixture(scope="module")
def spark():
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false").getOrCreate())


@pytest.fixture()
def corpus(spark):
    rows = [(i, f"document body {i}", f'{{"id": {i}}}'.encode())
            for i in range(37)]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "meta binary")


class TestWriteRead:
    def test_round_trip(self, spark, corpus, tmp_path):
        out = str(tmp_path / "wds")
        man = write_webdataset(
            corpus, out, "doc_id", {"text": "txt", "meta": "json"},
            n_shards=4,
            shard_expr=F.pmod(F.col("doc_id"), F.lit(4))).collect()
        assert sum(r["n_samples"] for r in man) == 37
        assert {r["shard"] for r in man} == {0, 1, 2, 3}
        back = read_webdataset(spark, out,
                               {"text": "txt", "meta": "json"},
                               binary_cols={"meta"})
        rows = {int(r["key"]): (r["text"], bytes(r["meta"]))
                for r in back.collect()}
        assert len(rows) == 37
        assert rows[11] == ("document body 11", b'{"id": 11}')

    def test_shard_contents_sorted_and_deterministic(self, spark, corpus,
                                                     tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        for out in (a, b):
            write_webdataset(corpus, out, "doc_id", {"text": "txt"},
                             shard_expr=F.pmod(F.col("doc_id"), F.lit(3))
                             ).collect()
        for k in range(3):
            fa = open(f"{a}/shard-{k:05d}.tar", "rb").read()
            fb = open(f"{b}/shard-{k:05d}.tar", "rb").read()
            assert fa == fb                        # byte-deterministic
        with tarfile.open(f"{a}/shard-00000.tar") as tar:
            names = tar.getnames()
        assert names == sorted(names)              # key-sorted samples

    def test_manifest_bytes_match_disk(self, spark, corpus, tmp_path):
        import os
        out = str(tmp_path / "wds2")
        man = write_webdataset(corpus, out, "doc_id", {"text": "txt"},
                               shard_expr=F.pmod(F.col("doc_id"),
                                                 F.lit(2))).collect()
        for r in man:
            sz = os.path.getsize(f"{out}/shard-{r['shard']:05d}.tar")
            assert sz == r["n_bytes"]

    def test_null_values_skipped(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a", None), (2, None, b"x")],
                                   "doc_id long, t string, b binary")
        out = str(tmp_path / "wds3")
        write_webdataset(df, out, "doc_id", {"t": "txt", "b": "bin"},
                         shard_expr=F.lit(0)).collect()
        back = read_webdataset(spark, out, {"t": "txt", "b": "bin"},
                               binary_cols={"b"})
        rows = {r["key"]: (r["t"], r["b"]) for r in back.collect()}
        assert rows["1"] == ("a", None)
        assert rows["2"][0] is None and bytes(rows["2"][1]) == b"x"

    def test_binary_cols_accepts_extensions(self, spark, corpus,
                                            tmp_path):
        """Review r8: the docstring promises extensions work in
        binary_cols; both extensions and column names now do."""
        out = str(tmp_path / "wds_ext")
        write_webdataset(corpus, out, "doc_id",
                         {"text": "txt", "meta": "json"},
                         shard_expr=F.lit(0)).collect()
        back = read_webdataset(spark, out,
                               {"text": "txt", "meta": "json"},
                               binary_cols={"json"})   # EXTENSION
        [r] = back.where(F.col("key") == "3").collect()
        assert bytes(r["meta"]) == b'{"id": 3}'
        assert isinstance(r["text"], str)

    def test_foreign_tar_entries_skipped(self, spark, tmp_path):
        """Review r8: externally produced tars carry directory/pax
        entries (extractfile -> None) and extension-less names — the
        reader skips them instead of crashing."""
        import io
        import tarfile
        out = tmp_path / "wds_foreign"
        out.mkdir()
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            d = tarfile.TarInfo("subdir")
            d.type = tarfile.DIRTYPE
            tar.addfile(d)
            noext = tarfile.TarInfo("readme")
            noext.size = 2
            tar.addfile(noext, io.BytesIO(b"hi"))
            ok = tarfile.TarInfo("k1.txt")
            ok.size = 5
            tar.addfile(ok, io.BytesIO(b"hello"))
        (out / "shard-00000.tar").write_bytes(buf.getvalue())
        rows = read_webdataset(spark, str(out), {"text": "txt"}).collect()
        assert [(r["key"], r["text"]) for r in rows] == [("k1", "hello")]

    def test_default_hash_sharding_covers_all_rows(self, spark, corpus,
                                                   tmp_path):
        out = str(tmp_path / "wds4")
        man = write_webdataset(corpus, out, "doc_id", {"text": "txt"},
                               n_shards=8).collect()
        assert sum(r["n_samples"] for r in man) == 37
        assert read_webdataset(spark, out, {"text": "txt"}).count() == 37

    def test_size_targeted_sharding(self, spark, tmp_path):
        """r9: with no n_shards/shard_expr the shard COUNT derives from
        the corpus's exact tar bytes over target_shard_bytes, so
        per-task memory stays ~target no matter the corpus size."""
        rows = [(i, "x" * 1000) for i in range(200)]   # 1537*200 tar B
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = str(tmp_path / "wds_sz")
        target = 20_000
        man = write_webdataset(df, out, "doc_id", {"text": "txt"},
                               target_shard_bytes=target).collect()
        # exact USTAR framing: 512 header + 1000 padded to 1024
        expected = -(-200 * (512 + 1024) // target)
        assert len(man) <= expected        # hash may leave a shard empty
        assert len(man) >= expected - 2
        assert sum(r["n_samples"] for r in man) == 200
        # uniform samples + hash assignment: every shard stays bounded
        assert max(r["n_bytes"] for r in man) < 3 * target
        assert read_webdataset(spark, out, {"text": "txt"}).count() == 200

    def test_size_targeted_empty_frame(self, spark, tmp_path):
        df = spark.createDataFrame([], "doc_id long, text string")
        out = str(tmp_path / "wds_empty")
        man = write_webdataset(df, out, "doc_id", {"text": "txt"}).collect()
        assert man == []

    def test_file_uri_write_and_read(self, spark, corpus, tmp_path):
        """r9: scheme:// URIs route through pyarrow.fs on the
        EXECUTORS (the JVM Hadoop handle is driver-only) — round trip
        through file:// exercises that path end to end."""
        out = f"file://{tmp_path}/wds_uri"
        man = write_webdataset(corpus, out, "doc_id", {"text": "txt"},
                               shard_expr=F.pmod(F.col("doc_id"),
                                                 F.lit(3))).collect()
        assert sum(r["n_samples"] for r in man) == 37
        import os
        assert sorted(os.listdir(f"{tmp_path}/wds_uri")) == \
            [f"shard-{k:05d}.tar" for k in range(3)]
        back = read_webdataset(spark, out, {"text": "txt"})
        rows = {int(r["key"]): r["text"] for r in back.collect()}
        assert rows[11] == "document body 11"


class TestShardsProperty:
    def test_round_trip_arbitrary_binaries(self, spark, tmp_path):
        """Hypothesis: write->read is the identity on arbitrary binary
        payloads (tar framing is byte-safe, keys survive as strings)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        counter = [0]

        @given(st.lists(st.binary(min_size=0, max_size=200),
                        min_size=1, max_size=8))
        @settings(max_examples=6, deadline=None)
        def check(blobs):
            counter[0] += 1
            out = str(tmp_path / f"wds_prop_{counter[0]}")
            df = spark.createDataFrame(
                [(i, bytearray(b)) for i, b in enumerate(blobs)],
                "k long, payload binary")
            write_webdataset(df, out, "k", {"payload": "bin"},
                             shard_expr=F.pmod(F.col("k"), F.lit(2))
                             ).collect()
            back = {int(r["key"]): bytes(r["payload"]) for r in
                    read_webdataset(spark, out, {"payload": "bin"},
                                    binary_cols={"bin"}).collect()}
            assert back == {i: b for i, b in enumerate(blobs)}

        check()


class TestWebdatasetIndex:
    """Tar member index (shards.py tar_members / webdataset_index):
    USTAR header arithmetic only — every span must range-read back the
    exact member bytes."""

    def test_spans_seek_back_exact_members(self, spark, tmp_path):
        from deequ_spark.llm import webdataset_index, write_webdataset
        df = spark.createDataFrame(
            [(i, f"text body {i} " * (1 + i % 3), f'{{"id": {i}}}')
             for i in range(12)],
            "doc_id long, text string, meta string")
        out = str(tmp_path / "wds")
        write_webdataset(df, out, "doc_id",
                         {"text": "txt", "meta": "json"},
                         n_shards=3).collect()
        files = spark.read.format("binaryFile").load(f"{out}/*.tar") \
            .select("path", "content")
        idx = webdataset_index(files)
        rows = idx.collect()
        assert len(rows) == 24                       # 12 keys x 2 exts
        assert {r["ext"] for r in rows} == {"txt", "json"}
        by_path = {}
        for r in rows:
            by_path.setdefault(r["path"].replace("file:", ""), []).append(r)
        for path, members in by_path.items():
            blob = open(path, "rb").read()
            for r in members:
                raw = blob[r["offset"]:r["offset"] + r["size"]]
                if r["ext"] == "txt":
                    assert raw.decode() == \
                        f'text body {r["key"]} ' * (1 + int(r["key"]) % 3)
                else:
                    assert raw.decode() == f'{{"id": {int(r["key"])}}}'

    def test_truncated_and_garbage_tars(self, spark):
        from deequ_spark.llm import webdataset_index
        import io, tarfile
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tar:
            for k in range(3):
                info = tarfile.TarInfo(f"{k}.txt")
                blob = b"y" * 100
                info.size = len(blob)
                tar.addfile(info, io.BytesIO(blob))
        whole = buf.getvalue()
        df = spark.createDataFrame(
            [("ok", bytearray(whole)),
             ("cut", bytearray(whole[:1700])),     # inside member 2\'s pad
             ("junk", bytearray(b"\x00" * 2048))],
            "path string, content binary")
        got = {}
        for r in webdataset_index(df).collect():
            got.setdefault(r["path"], []).append(r["member"])
        assert sorted(got["ok"]) == ["0.txt", "1.txt", "2.txt"]
        assert sorted(got["cut"]) == ["0.txt", "1.txt"]
        assert "junk" not in got


class TestLongMemberNames:
    """r11 ADVICE: members past the 100-byte name field must index under
    their FULL names — POSIX ustar prefix and GNU 'L' longname both."""

    def _roundtrip(self, spark, fmt):
        import io, tarfile
        from deequ_spark.llm import webdataset_index
        long_key = "deep/" * 24 + "sample-000123"     # 133-char stem
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tar:
            for name, blob in [(f"{long_key}.txt", b"long body"),
                               ("short.txt", b"short body")]:
                info = tarfile.TarInfo(name)
                info.size = len(blob)
                tar.addfile(info, io.BytesIO(blob))
        whole = buf.getvalue()
        df = spark.createDataFrame([("t", bytearray(whole))],
                                   "path string, content binary")
        rows = {r["member"]: r for r in webdataset_index(df).collect()}
        assert set(rows) == {f"{long_key}.txt", "short.txt"}
        r = rows[f"{long_key}.txt"]
        assert r["key"] == long_key
        assert whole[r["offset"]:r["offset"] + r["size"]] == b"long body"

    def test_ustar_prefix_field(self, spark):
        import tarfile
        self._roundtrip(spark, tarfile.USTAR_FORMAT)

    def test_gnu_longname_entry(self, spark):
        import tarfile
        self._roundtrip(spark, tarfile.GNU_FORMAT)


class TestUpdateWebdatasetIndex:
    def test_incremental_state_machine(self, spark, tmp_path):
        from deequ_spark.llm import (update_webdataset_index,
                                     write_webdataset)
        store = tmp_path / "store"
        store.mkdir()
        idx = str(tmp_path / "idx")

        def add_shards(sub, n_docs, base):
            df = spark.createDataFrame(
                [(base + i, f"t{base + i}") for i in range(n_docs)],
                "doc_id long, text string")
            write_webdataset(df, str(store), "doc_id",
                             {"text": "txt"}, n_shards=1,
                             shard_expr=None).collect()
            # write_webdataset names shard-00000.tar; rename per batch
            (store / "shard-00000.tar").rename(store / f"{sub}.tar")

        add_shards("day1", 5, 0)
        st = update_webdataset_index(spark, idx, f"{store}/*.tar")
        assert st == {"known_files": 0, "scanned_files": 1,
                      "removed_rows": 0}
        assert spark.read.parquet(idx).count() == 5
        add_shards("day2", 3, 100)
        st = update_webdataset_index(spark, idx, f"{store}/*.tar")
        assert st == {"known_files": 1, "scanned_files": 1,
                      "removed_rows": 0}
        assert spark.read.parquet(idx).count() == 8
        (store / "day1.tar").unlink()
        st = update_webdataset_index(spark, idx, f"{store}/*.tar")
        assert st == {"known_files": 1, "scanned_files": 0,
                      "removed_rows": 5}
        left = spark.read.parquet(idx)
        assert left.count() == 3
        assert all(int(r["key"]) >= 100 for r in left.collect())
