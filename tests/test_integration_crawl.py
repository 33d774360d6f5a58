"""Cross-module integration: crawl archive -> CDX index -> corpus ->
cleanup pipeline -> leakage-safe split -> WET re-export -> round trip.

Each stage has its own oracle-checked driver query; this test proves
the HANDOFFS compose — column contracts, id discipline, byte formats —
the thing per-operator tests can't see."""

import gzip

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def crawl_dir(spark, tmp_path_factory):
    from deequ_spark.llm import build_warc_file, build_warc_record
    d = tmp_path_factory.mktemp("crawl")
    fluent = ("the results of the experiment were consistent with the "
              "theory and we will be happy to report the findings to "
              "the committee next week with a detailed analysis ")
    for f in range(4):
        records = []
        for k in range(25):
            i = f * 25 + k
            text = fluent + f"document marker {i}"
            if i % 10 == 0 and i > 0:       # exact duplicates of doc 0
                text = fluent + "document marker 0"
            records.append(build_warc_record(
                "conversion", text.encode(),
                target_uri=f"http://site{i % 5}.example.org/p/{i}",
                record_id=f"urn:wet:{i}",
                content_type="text/plain"))
        (d / f"part-{f}.warc.wet.gz").write_bytes(
            build_warc_file(records, gzip_members=True))
    return str(d)


class TestCrawlToTrainingSet:
    def test_cdx_spans_index_the_archive(self, spark, crawl_dir):
        from deequ_spark.llm import warc_cdx_index
        from deequ_spark.llm.warc import iter_warc_records
        files = spark.read.format("binaryFile") \
            .load(f"{crawl_dir}/*.warc.wet.gz") \
            .select("path", "content")
        idx = warc_cdx_index(files).cache()
        assert idx.count() == 100
        # every span seeks back to exactly its record
        sample = idx.where(F.col("url").endswith("/p/37")).collect()
        assert len(sample) == 1
        row = sample[0]
        blob = open(row["path"].replace("file:", ""), "rb").read()
        member = blob[row["offset"]:row["offset"] + row["length"]]
        recs = list(iter_warc_records(gzip.decompress(member)))
        assert recs[0][0]["WARC-Target-URI"] == row["url"]
        assert row["urlkey"].startswith("org,example,site2)/p/37")
        idx.unpersist()

    def test_crawl_to_corpus_to_split_to_wet_roundtrip(
            self, spark, crawl_dir, tmp_path):
        from deequ_spark.llm import (assign_split, crawl_to_corpus,
                                     prepare_training_corpus, read_warc,
                                     wet_documents, write_wet)
        # the packaged one-call path: hashed doc ids, full stats
        _chunks, stats = crawl_to_corpus(
            spark, f"{crawl_dir}/*.warc.wet.gz",
            min_words=10, boilerplate=False, near_dedup=False,
            chunk=False, gopher_kwargs={"min_stopword_hits": 1})
        # 100 records, 9 exact duplicates of doc 0's text collapse
        assert stats["input"] == 100
        assert stats["exact_dedup"] == 91
        # URL-keyed variant of the same pipeline for the split/export
        # handoffs (the id column is caller-chosen by contract)
        clean, _ = prepare_training_corpus(
            wet_documents(read_warc(spark, f"{crawl_dir}/*.warc.wet.gz",
                                    warc_types={"conversion"})),
            "url", "text",
            min_words=10, boilerplate=False, near_dedup=False,
            chunk=False, gopher_kwargs={"min_stopword_hits": 1})
        # leakage-safe split on the URL host: no host straddles
        docs = clean.withColumn(
            "host", F.regexp_extract("url", r"//([^/]+)/", 1))
        split = assign_split(docs, "host",
                             {"train": 0.8, "eval": 0.2})
        straddle = (split.groupBy("host")
                    .agg(F.countDistinct("split").alias("n"))
                    .where("n > 1").count())
        assert straddle == 0
        # WET re-export and read-back: text survives byte-exactly
        train = split.where("split = 'train'")
        assert train.count() > 20
        out = str(tmp_path / "wet_out")
        write_wet(train, out, url_col="url", text_col="text").collect()
        back = wet_documents(read_warc(spark, f"{out}/*.warc.wet.gz"))
        want = {(r["url"], r["text"]) for r in
                train.select("url", "text").collect()}
        got = {(r["url"], r["text"]) for r in
               back.select("url", "text").collect()}
        assert got == want


class TestCdxLayoutComposition:
    """The 100 TB lookup story end-to-end: a CDX index CLUSTERED by
    urlkey (repartitionByRange + task sort) and written with a per-file
    manifest lets a host-prefix lookup skip almost every file — the
    build-once index composed with the layout/skipping machinery."""

    def test_urlkey_clustered_index_prunes_host_lookups(
            self, spark, crawl_dir, tmp_path):
        from deequ_spark.llm import warc_cdx_index
        from deequ_spark.sources import read_corpus, write_manifest

        files = spark.read.format("binaryFile") \
            .load(f"{crawl_dir}/*.warc.wet.gz").select("path", "content")
        idx = warc_cdx_index(files)
        out = str(tmp_path / "cdx_clustered")
        # range-cluster by urlkey: every file gets a tight urlkey span
        (idx.repartitionByRange(8, "urlkey")
            .sortWithinPartitions("urlkey")
            .write.mode("overwrite").parquet(out))
        write_manifest(spark, out, ["urlkey"])
        manifest = spark.read.parquet(f"{out}/_manifest").collect()
        n_files = len(manifest)
        assert n_files >= 4
        # lookup: all captures of site2 (SURT prefix range)
        lo, hi = "org,example,site2)/", "org,example,site2)0"
        pruned = read_corpus(spark, out, prune={"urlkey": (lo, hi)})
        got = pruned.where(
            (F.col("urlkey") >= lo) & (F.col("urlkey") < hi))
        assert got.count() == 20                  # 100 docs over 5 hosts
        # the manifest keeps only files whose span intersects the host
        kept = [r for r in manifest
                if not (r["max_urlkey"] < lo or r["min_urlkey"] > hi)]
        assert len(kept) < n_files               # real skipping
        assert pruned.rdd.getNumPartitions() <= len(kept) + 1
