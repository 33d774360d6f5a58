"""WARC/WET ingest (deequ_spark/llm/warc.py): record splitting, gzip
members, header extraction, WET text extraction, HTTP response parsing,
malformed-record recovery, and the map-only plan contract."""

import gzip

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deequ_spark.llm.warc import (build_warc_file, build_warc_record,
                                  http_responses, iter_warc_records,
                                  parse_warc_files, read_warc,
                                  split_gzip_members, wet_documents)


@pytest.fixture(scope="module")
def spark():
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false").getOrCreate())


def _conv(i, text=None):
    text = text if text is not None else f"document body {i} " * 3
    return build_warc_record(
        "conversion", text.encode("utf-8"),
        target_uri=f"http://site{i % 3}.example.com/page/{i}",
        record_id=f"urn:uuid:rec-{i}", content_type="text/plain")


def _resp(i, body=b"<html>hi</html>", status=200,
          ctype="text/html; charset=utf-8"):
    http = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    return build_warc_record(
        "response", http,
        target_uri=f"http://site{i % 3}.example.com/page/{i}",
        record_id=f"urn:uuid:resp-{i}",
        content_type="application/http; msgtype=response")


class TestPurePythonParser:
    def test_round_trip_plain(self):
        recs = [_conv(0), _resp(1), _conv(2)]
        out = list(iter_warc_records(build_warc_file(recs)))
        assert len(out) == 3
        types = [h.get("WARC-Type") for h, _ in out]
        assert types == ["conversion", "response", "conversion"]
        assert out[0][1].decode().startswith("document body 0")

    def test_round_trip_gzip_members(self):
        recs = [_conv(i) for i in range(5)]
        blob = build_warc_file(recs, gzip_members=True)
        assert blob[:2] == b"\x1f\x8b"
        out = list(iter_warc_records(blob))
        assert len(out) == 5

    def test_single_member_gzip_whole_file(self):
        blob = gzip.compress(build_warc_file([_conv(0), _conv(1)]))
        assert len(list(iter_warc_records(blob))) == 2

    def test_payload_may_contain_record_magic(self):
        evil = b"WARC/1.0\r\nWARC-Type: fake\r\n\r\n tricky"
        recs = [build_warc_record("conversion", evil,
                                  target_uri="http://x.example.com/"),
                _conv(7)]
        out = list(iter_warc_records(build_warc_file(recs)))
        # Content-Length framing must carry the parser PAST the embedded
        # magic: exactly 2 real records, first payload intact
        assert len(out) == 2
        assert out[0][1] == evil

    def test_malformed_record_skipped_not_fatal(self):
        bad = b"WARC/1.0\r\nWARC-Type: broken\r\nno content length\r\n\r\n"
        data = bad + build_warc_file([_conv(3)])
        out = list(iter_warc_records(data))
        assert len(out) == 1
        assert out[0][0]["WARC-Type"] == "conversion"

    def test_truncated_final_record_dropped(self):
        blob = build_warc_file([_conv(0), _conv(1)])
        out = list(iter_warc_records(blob[:-30]))
        assert len(out) == 1

    def test_split_gzip_passthrough(self):
        assert split_gzip_members(b"plain bytes") == b"plain bytes"

    def test_header_case_insensitive(self):
        rec = (b"WARC/1.0\r\nwarc-type: conversion\r\n"
               b"content-length: 2\r\n\r\nhi\r\n\r\n")
        [(h, p)] = list(iter_warc_records(rec))
        assert p == b"hi"


class TestSparkSurface:
    @pytest.fixture()
    def warc_dir(self, tmp_path):
        d = tmp_path / "warc"
        d.mkdir()
        # file 0: plain, conversions 0..4 + a warcinfo
        info = build_warc_record("warcinfo", b"software: test\r\n",
                                 content_type="application/warc-fields")
        (d / "f0.warc").write_bytes(
            build_warc_file([info] + [_conv(i) for i in range(5)]))
        # file 1: gzip members, conversions 5..9 + responses
        (d / "f1.warc.gz").write_bytes(build_warc_file(
            [_conv(i) for i in range(5, 10)] + [_resp(i) for i in (5, 6)],
            gzip_members=True))
        return str(d)

    def test_read_counts_and_headers(self, spark, warc_dir):
        recs = read_warc(spark, warc_dir)
        by_type = {r["warc_type"]: r["n"] for r in
                   recs.groupBy("warc_type").agg(F.count("*").alias("n"))
                   .collect()}
        assert by_type == {"warcinfo": 1, "conversion": 10, "response": 2}
        row = recs.where(F.col("record_id") == "<urn:uuid:rec-7>") \
            .collect()[0]
        assert row["target_uri"] == "http://site1.example.com/page/7"
        assert row["warc_date"] == "2024-01-01T00:00:00Z"
        assert row["content_length"] == len(b"document body 7 " * 3)
        assert row["headers"]["WARC-Type"] == "conversion"

    def test_type_filter_in_parser(self, spark, warc_dir):
        recs = read_warc(spark, warc_dir, warc_types={"conversion"})
        assert recs.count() == 10

    def test_wet_documents_feed_pipeline(self, spark, warc_dir):
        from deequ_spark.llm import canonicalize_url
        from deequ_spark.llm.text import normalize_text
        docs = wet_documents(read_warc(spark, warc_dir))
        assert docs.columns == ["url", "text"]
        assert docs.count() == 10
        out = normalize_text(
            docs.withColumn("curl", canonicalize_url(F.col("url"))),
            "text")
        rows = out.collect()
        assert all(r["curl"].startswith("http://site") for r in rows)
        assert all("document body" in r["text_clean"] for r in rows)

    def test_http_responses_parsed(self, spark, warc_dir):
        resp = http_responses(read_warc(spark, warc_dir))
        rows = resp.orderBy("url").collect()
        assert len(rows) == 2
        assert all(r["status"] == 200 for r in rows)
        assert all(r["http_content_type"].startswith("text/html")
                   for r in rows)
        assert all(bytes(r["body"]) == b"<html>hi</html>" for r in rows)

    def test_headerless_payload_yields_nulls(self, spark, tmp_path):
        """r9 review fix: a response payload with NO \\r\\n\\r\\n
        header terminator is not a parseable HTTP message — status AND
        body must be NULL, not a garbage body missing its first 3
        bytes."""
        d = tmp_path / "warc_hl"
        d.mkdir()
        bad = build_warc_record(
            "response", b"not an http message at all",
            target_uri="http://bad.example.com/",
            record_id="urn:uuid:bad",
            content_type="application/http; msgtype=response")
        (d / "f.warc").write_bytes(build_warc_file([bad, _resp(1)]))
        rows = {r["url"]: r for r in
                http_responses(read_warc(spark, str(d))).collect()}
        b = rows["http://bad.example.com/"]
        assert b["status"] is None
        assert b["body"] is None
        assert b["http_content_type"] is None
        ok = rows["http://site1.example.com/page/1"]
        assert ok["status"] == 200
        assert bytes(ok["body"]) == b"<html>hi</html>"

    def test_plan_is_map_only(self, spark, warc_dir):
        recs = read_warc(spark, warc_dir, warc_types={"conversion"})
        plan = recs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]

    def test_min_partitions_spreads_files(self, spark, warc_dir):
        recs = read_warc(spark, warc_dir, min_partitions=4)
        assert recs.rdd.getNumPartitions() == 4

    def test_non_utf8_response_body_byte_exact(self, spark, tmp_path):
        d = tmp_path / "w2"
        d.mkdir()
        body = bytes(range(256))          # invalid UTF-8 on purpose
        (d / "f.warc").write_bytes(build_warc_file([_resp(0, body=body)]))
        [r] = http_responses(read_warc(spark, str(d))).collect()
        assert bytes(r["body"]) == body

    def test_non_ascii_header_bytes_keep_body_byte_exact(self, spark,
                                                         tmp_path):
        """Review r8: a UTF-8 cast made instr() return a CHARACTER
        position while substring(binary) wants BYTES — every multibyte
        header byte shifted the body split left. Crawl headers carry
        latin-1/UTF-8 routinely (Server, Content-Disposition)."""
        d = tmp_path / "w3"
        d.mkdir()
        body = b"BODYBYTES123"
        http = ("HTTP/1.1 200 OK\r\nServer: caf\u00e9-prod\r\n"
                "Content-Type: text/plain\r\n\r\n").encode("utf-8") + body
        rec = build_warc_record("response", http,
                                target_uri="http://x.example.com/")
        (d / "f.warc").write_bytes(build_warc_file([rec]))
        [r] = http_responses(read_warc(spark, str(d))).collect()
        assert bytes(r["body"]) == body
        assert r["status"] == 200


class TestCrawlToCorpus:
    def test_end_to_end(self, spark, tmp_path):
        """WARC files -> WET extraction -> url ids -> full cleanup
        pipeline: quality gate, exact dedup (a verbatim re-fetch under a
        different URL is dropped), chunking."""
        from deequ_spark.llm import crawl_to_corpus
        d = tmp_path / "crawl"
        d.mkdir()
        body = ("the quick brown fox jumps to the top of the hill "
                "and naps with one eye open beside the river " * 10)
        other = ("entirely different corpus content with notes of "
                 "mountain ranges and glacial valleys carved out of "
                 "stone to the delight of every passing geologist " * 8)
        recs = [
            build_warc_record("conversion", body.encode(),
                              target_uri="http://a.example.com/1",
                              content_type="text/plain"),
            build_warc_record("conversion", body.encode(),     # exact dup
                              target_uri="http://b.example.com/2",
                              content_type="text/plain"),
            build_warc_record("conversion", other.encode(),
                              target_uri="http://c.example.com/3",
                              content_type="text/plain"),
            build_warc_record("conversion", b"too short",      # quality cut
                              target_uri="http://d.example.com/4",
                              content_type="text/plain"),
            build_warc_record("response", b"HTTP/1.1 200 X\r\n\r\nhtml",
                              target_uri="http://a.example.com/1"),
        ]
        (d / "f.warc.gz").write_bytes(build_warc_file(recs,
                                                      gzip_members=True))
        chunks, stats = crawl_to_corpus(
            spark, str(d), near_dedup=False, boilerplate=False,
            chunk_tokens=64, chunk_overlap=0)
        assert stats["input"] == 4                # response filtered out
        assert stats["quality"] == 3              # 'too short' cut
        assert stats["exact_dedup"] == 2          # verbatim re-fetch cut
        assert chunks.count() >= 2

    def test_raw_html_responses_source(self, spark, tmp_path):
        """source='responses': raw HTML pages flow through status/type
        gating + html_to_text into the same pipeline."""
        from deequ_spark.llm import crawl_to_corpus
        d = tmp_path / "crawl_html"
        d.mkdir()
        prose = ("the quick brown fox jumps to the top of the hill "
                 "and naps with one eye open beside the river " * 10)

        def resp(url, body, status=200, ctype="text/html"):
            http = (f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}"
                    f"\r\n\r\n").encode() + body
            return build_warc_record("response", http, target_uri=url)

        recs = [
            resp("http://a.example.com/",
                 f"<html><body><p>{prose}</p></body></html>".encode()),
            resp("http://b.example.com/", b"<p>gone</p>", status=500),
            build_warc_record("conversion", prose.encode(),
                              target_uri="http://c.example.com/"),
        ]
        (d / "f.warc").write_bytes(build_warc_file(recs))
        chunks, stats = crawl_to_corpus(
            spark, str(d), source="responses", near_dedup=False,
            boilerplate=False, chunk=False)
        assert stats["input"] == 1                # only the 200 html page
        [r] = chunks.collect()
        assert r["text"].startswith("the quick brown fox")


class TestStreamingWarc:
    def test_stream_matches_batch(self, spark, tmp_path):
        """readStream(binaryFile) -> record splitter: one batch per file
        (maxFilesPerTrigger=1 + availableNow), streamed record rows must
        equal the batch read of the same directory — the continuous
        crawl-ingest shape."""
        from deequ_spark.llm import read_warc_stream
        d = tmp_path / "stream_warc"
        d.mkdir()
        for k in range(3):
            recs = [_conv(10 * k + i) for i in range(4)]
            (d / f"seg{k}.warc.gz").write_bytes(
                build_warc_file(recs, gzip_members=True))

        stream = read_warc_stream(spark, str(d),
                                  warc_types={"conversion"},
                                  max_files_per_trigger=1)
        assert stream.isStreaming
        seen = []

        def sink(batch_df, batch_id):
            seen.append((batch_id,
                         [r["record_id"] for r in batch_df.collect()]))

        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert len(seen) == 3                      # one batch per file
        streamed = sorted(rid for _, rids in seen for rid in rids)
        batch = sorted(r["record_id"] for r in
                       read_warc(spark, str(d),
                                 warc_types={"conversion"}).collect())
        assert streamed == batch and len(streamed) == 12


class TestContinuousCrawlDedup:
    def test_two_batches_second_dedupes_against_first(self, spark,
                                                      tmp_path):
        """r9: the wired production loop (crawl_dedup_stream) — batch 1
        bootstraps the index; batch 2's re-fetches classify as
        duplicates AGAINST BATCH 1's appended rows and only novel docs
        reach the fresh sink."""
        import os
        import time as _time

        from deequ_spark.llm import crawl_dedup_stream
        d = tmp_path / "crawl_in"
        d.mkdir()
        t_a = ("the quick brown fox jumps over the lazy dog near the "
               "river bank on a bright morning in early spring")
        t_b = ("spark builds a logical plan then the optimizer picks "
               "the physical strategy for every join in the query")
        t_c = ("completely novel text about penguins waddling across "
               "the antarctic ice sheet in the long polar night")

        def wet(url, text):
            return build_warc_record("conversion", text.encode(),
                                     target_uri=url)

        f0 = d / "seg0.warc.gz"
        f0.write_bytes(build_warc_file(
            [wet("http://x.com/a", t_a), wet("http://x.com/b", t_b)],
            gzip_members=True))
        f1 = d / "seg1.warc.gz"
        f1.write_bytes(build_warc_file(
            # /a re-fetched byte-identical (exact dup of batch 1's row)
            # + one genuinely new page
            [wet("http://x.com/a", t_a), wet("http://x.com/c", t_c)],
            gzip_members=True))
        # the file source orders batches by modification time — pin it
        now = _time.time()
        os.utime(f0, (now - 60, now - 60))
        os.utime(f1, (now, now))

        fresh_seen, dup_seen = [], []

        def on_fresh(df, bid):
            fresh_seen.append((bid, {r["url"]: r["doc_id"]
                                     for r in df.collect()}))

        def on_dups(df, bid):
            dup_seen.append((bid, df.collect()))

        idx = str(tmp_path / "crawl_idx")
        q = crawl_dedup_stream(
            spark, str(d), idx, on_fresh,
            checkpoint=str(tmp_path / "ckpt_crawl"),
            max_files_per_trigger=1, available_now=True,
            on_duplicates=on_dups)
        q.awaitTermination(180)

        assert [bid for bid, _ in fresh_seen] == [0, 1]
        assert set(fresh_seen[0][1]) == {"http://x.com/a",
                                         "http://x.com/b"}
        # batch 2: /a is an exact duplicate of BATCH 1's appended row,
        # only /c is fresh
        assert set(fresh_seen[1][1]) == {"http://x.com/c"}
        [(bid, dups)] = [x for x in dup_seen if x[1]]
        assert bid == 1
        [dup] = dups
        assert dup["match_kind"] == "exact"
        assert dup["matched_id"] == fresh_seen[0][1]["http://x.com/a"]
        # the index now holds all three docs — a later batch-mode
        # classify sees them (stream + batch share one index)
        from deequ_spark.llm import dedup_against_index
        probe = spark.createDataFrame(
            [(1, t_a), (2, t_c), (3, "something else entirely fresh "
                                     "with brand new words")],
            "doc_id long, text string")
        fresh, dups = dedup_against_index(probe, "doc_id", "text", idx,
                                          threshold=0.5)
        assert sorted(r["id"] for r in dups.collect()) == [1, 2]
        assert [r["doc_id"] for r in fresh.collect()] == [3]


class TestContinuousCrawlIntraBatch:
    def test_within_batch_duplicates_collapse(self, spark, tmp_path):
        """r9 review fix: a segment re-fetches URLs and mirrors pages
        INSIDE one micro-batch too — re-fetches (same url+text), same
        text under a different URL, and near-duplicate text must all
        collapse to one survivor before anything reaches the sink or
        the index."""
        from deequ_spark.llm import crawl_dedup_stream
        d = tmp_path / "crawl_ib"
        d.mkdir()
        t = ("the quick brown fox jumps over the lazy dog near the "
             "river bank on a bright morning in early spring today")
        t_near = t.replace("today", "tonight")

        def wet(url, text):
            return build_warc_record("conversion", text.encode(),
                                     target_uri=url)

        (d / "seg0.warc.gz").write_bytes(build_warc_file(
            [wet("http://x.com/a", t),      # original
             wet("http://x.com/a", t),      # re-fetch: same doc_id
             wet("http://x.com/mirror", t),  # mirror: same fingerprint
             wet("http://x.com/near", t_near)],  # near-dup in batch
            gzip_members=True))

        fresh_seen = []

        def on_fresh(df, bid):
            fresh_seen.append(df.collect())

        q = crawl_dedup_stream(
            spark, str(d), str(tmp_path / "ib_idx"), on_fresh,
            checkpoint=str(tmp_path / "ckpt_ib"),
            threshold=0.5, available_now=True)
        q.awaitTermination(180)
        [rows] = fresh_seen
        assert len(rows) == 1              # ONE survivor of the cluster
        # the index holds exactly that one doc
        idx_docs = spark.read.parquet(str(tmp_path / "ib_idx" / "docs"))
        assert idx_docs.count() == 1

    def test_within_batch_near_toggle_off(self, spark, tmp_path):
        """within_batch_near=False keeps near-dups (exact intra-batch
        dedup still applies)."""
        from deequ_spark.llm import crawl_dedup_stream
        d = tmp_path / "crawl_ib2"
        d.mkdir()
        t = ("the quick brown fox jumps over the lazy dog near the "
             "river bank on a bright morning in early spring today")
        t_near = t.replace("today", "tonight")

        def wet(url, text):
            return build_warc_record("conversion", text.encode(),
                                     target_uri=url)

        (d / "seg0.warc.gz").write_bytes(build_warc_file(
            [wet("http://x.com/a", t), wet("http://x.com/near", t_near)],
            gzip_members=True))
        fresh_seen = []
        q = crawl_dedup_stream(
            spark, str(d), str(tmp_path / "ib2_idx"),
            lambda df, bid: fresh_seen.append(df.collect()),
            checkpoint=str(tmp_path / "ckpt_ib2"),
            threshold=0.5, available_now=True, within_batch_near=False)
        q.awaitTermination(180)
        [rows] = fresh_seen
        assert len(rows) == 2


class TestWarcProperties:
    """Hypothesis: the parser inverts the builder for ARBITRARY payloads
    (binary-safe framing), in both plain and gzip-member encodings."""

    def test_round_trip_random_payloads(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        payloads = st.lists(st.binary(min_size=0, max_size=400),
                            min_size=1, max_size=12)

        @given(payloads, st.booleans())
        @settings(max_examples=150, deadline=None)
        def check(blobs, gz):
            recs = [build_warc_record(
                "conversion", b,
                target_uri=f"http://x.example.com/{i}")
                for i, b in enumerate(blobs)]
            out = list(iter_warc_records(
                build_warc_file(recs, gzip_members=gz)))
            assert len(out) == len(blobs)
            for (h, p), want in zip(out, blobs):
                assert p == want
                assert h["WARC-Type"] == "conversion"

        check()


class TestCrawlMainContent:
    def test_responses_main_content_drops_chrome(self, spark, tmp_path):
        """r9: crawl_to_corpus(source='responses', main_content=True)
        strips nav/footer chrome at EXTRACTION time."""
        from deequ_spark.llm.warc import crawl_to_corpus
        d = tmp_path / "warc_mc2"
        d.mkdir()
        prose = ("the quick brown fox jumps over the lazy dog daily "
                 "and naps with one eye open beside the river " * 10)
        page = ("<html><body>"
                "<div><a href='/'>Home</a> | <a href='/x'>About</a> | "
                "<a href='/y'>Contact</a></div>"
                f"<p>{prose}</p>"
                "<div><a href='/p'>Privacy</a> <a href='/t'>Terms</a> "
                "<a href='/i'>(c) 2026 Example Corp</a></div>"
                "</body></html>").encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + page)
        rec = build_warc_record("response", http,
                                target_uri="http://mc.example.com/")
        (d / "f.warc").write_bytes(build_warc_file([rec]))
        chunks, _ = crawl_to_corpus(spark, str(d), source="responses",
                                    main_content=True, near_dedup=False,
                                    boilerplate=False, chunk=False)
        [r] = chunks.collect()
        assert r["text"].startswith("the quick brown fox")
        assert "Home" not in r["text"] and "Privacy" not in r["text"]

    def test_wet_main_content_rejected(self, spark, tmp_path):
        from deequ_spark.llm.warc import crawl_to_corpus
        with pytest.raises(ValueError, match="responses"):
            crawl_to_corpus(spark, str(tmp_path), source="wet",
                            main_content=True)


class TestWriteWet:
    def test_round_trip_through_the_reader(self, spark, tmp_path):
        from deequ_spark.llm import read_warc, wet_documents, write_wet
        rows = [(f"http://h{i % 5}.test/p{i}",
                 f"document {i} body with ünïcode ⚙ and\nnewlines")
                for i in range(200)]
        df = spark.createDataFrame(rows, "url string, text string")
        p = str(tmp_path / "wet_out")
        manifest = write_wet(df, p, target_shard_bytes=4096).collect()
        assert sum(m["n_records"] for m in manifest) == 200
        assert len(manifest) > 1  # size targeting split the corpus
        back = wet_documents(read_warc(spark, p))
        got = sorted(tuple(r) for r in back.collect())
        assert got == sorted(rows)

    def test_deterministic_bytes_and_plain_variant(self, spark, tmp_path):
        from deequ_spark.llm import write_wet
        import glob
        df = spark.createDataFrame(
            [("http://a.test/1", "alpha"), ("http://a.test/2", "beta")],
            "url string, text string")
        p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        write_wet(df, p1, n_shards=1).collect()
        write_wet(df, p2, n_shards=1).collect()
        [f1] = glob.glob(f"{p1}/*.warc.wet.gz")
        [f2] = glob.glob(f"{p2}/*.warc.wet.gz")
        assert open(f1, "rb").read() == open(f2, "rb").read()
        p3 = str(tmp_path / "w3")
        write_wet(df, p3, n_shards=1, gzip_members=False).collect()
        [f3] = glob.glob(f"{p3}/*.warc.wet")
        raw = open(f3, "rb").read()
        assert raw.startswith(b"WARC/1.0") and b"conversion" in raw

    def test_null_rows_skipped(self, spark, tmp_path):
        from deequ_spark.llm import read_warc, wet_documents, write_wet
        df = spark.createDataFrame(
            [("http://x.test/a", "keep"), (None, "drop"),
             ("http://x.test/b", None)], "url string, text string")
        p = str(tmp_path / "w4")
        m = write_wet(df, p, n_shards=1).collect()
        assert sum(r["n_records"] for r in m) == 1
        assert wet_documents(read_warc(spark, p)).count() == 1


class TestCdxIndex:
    """CDX(J) capture index (warc.py surt_key / warc_cdx_index):
    on-disk spans must be directly seekable — the whole point of the
    index — verified by re-reading every (offset, length) span and
    parsing exactly the indexed record out of it."""

    def _records(self):
        from deequ_spark.llm import build_warc_record
        return [build_warc_record(
            "response", f"body {i}".encode(),
            target_uri=f"http://www.site{i % 3}.org/page/{i}",
            record_id=f"urn:x:{i}") for i in range(6)]

    def test_gzip_member_spans_seekable(self, spark):
        import gzip
        from deequ_spark.llm import build_warc_file, warc_cdx_index
        from deequ_spark.llm.warc import iter_warc_records
        blob = build_warc_file(self._records(), gzip_members=True)
        df = spark.createDataFrame([("f0", bytearray(blob))],
                                   "path string, content binary")
        rows = sorted(warc_cdx_index(df).collect(),
                      key=lambda r: r["offset"])
        assert len(rows) == 6
        for k, r in enumerate(rows):
            member = blob[r["offset"]:r["offset"] + r["length"]]
            recs = list(iter_warc_records(gzip.decompress(member)))
            assert len(recs) == 1
            assert recs[0][0]["WARC-Target-URI"] == r["url"]
            assert r["urlkey"] == f"org,site{k % 3})/page/{k}"
            assert r["timestamp"] == "20240101000000"
        # spans tile the file exactly
        assert rows[0]["offset"] == 0
        assert rows[-1]["offset"] + rows[-1]["length"] == len(blob)

    def test_plain_spans_and_digest(self, spark):
        import hashlib
        from deequ_spark.llm import build_warc_file, warc_cdx_index
        recs = self._records()
        blob = build_warc_file(recs, gzip_members=False)
        df = spark.createDataFrame([("f0", bytearray(blob))],
                                   "path string, content binary")
        rows = sorted(warc_cdx_index(df).collect(),
                      key=lambda r: r["offset"])
        # plain spans are the framing bytes, contiguous
        assert [r["offset"] for r in rows] == \
            [sum(len(x) for x in recs[:k]) for k in range(6)]
        assert [r["length"] for r in rows] == [len(x) for x in recs]
        assert rows[2]["digest"] == hashlib.sha256(b"body 2").hexdigest()

    def test_truncated_tail_dropped(self, spark):
        from deequ_spark.llm import build_warc_file, warc_cdx_index
        blob = build_warc_file(self._records())[:-30]  # cut last record
        df = spark.createDataFrame([("f0", bytearray(blob))],
                                   "path string, content binary")
        assert warc_cdx_index(df).count() == 5

    def test_surt_key_rules(self):
        from deequ_spark.llm import surt_key
        assert surt_key("https://www.News.Example.com/a/B?q=1") == \
            "com,example,news)/a/b?q=1"
        assert surt_key("http://host.io") == "io,host)/"
        assert surt_key("http://h.io:8080/x") == "io,h:8080)/x"
        assert surt_key("ftp://h.io/x") is None
        assert surt_key(None) is None
        assert surt_key("not a url") is None


class TestUpdateCdxIndex:
    def test_incremental_append_and_ghost_drop(self, spark, tmp_path):
        from deequ_spark.llm import (build_warc_file, build_warc_record,
                                     update_cdx_index)
        arch = tmp_path / "arch"
        arch.mkdir()
        idx_path = str(tmp_path / "cdx")

        def warc(n, tag):
            return build_warc_file([build_warc_record(
                "conversion", f"{tag} body {k}".encode(),
                target_uri=f"http://{tag}.io/{k}") for k in range(n)],
                gzip_members=True)

        (arch / "day1.warc.gz").write_bytes(warc(4, "a"))
        st = update_cdx_index(spark, idx_path, f"{arch}/*.warc.gz")
        assert st == {"known_files": 0, "scanned_files": 1,
                      "removed_rows": 0}
        assert spark.read.parquet(idx_path).count() == 4
        # append a day: only the new file is scanned
        (arch / "day2.warc.gz").write_bytes(warc(3, "b"))
        st = update_cdx_index(spark, idx_path, f"{arch}/*.warc.gz")
        assert st == {"known_files": 1, "scanned_files": 1,
                      "removed_rows": 0}
        idx = spark.read.parquet(idx_path)
        assert idx.count() == 7
        # no-op call touches nothing
        st = update_cdx_index(spark, idx_path, f"{arch}/*.warc.gz")
        assert st == {"known_files": 2, "scanned_files": 0,
                      "removed_rows": 0}
        # delete day1: its 4 rows are dropped, day2 rows survive
        (arch / "day1.warc.gz").unlink()
        st = update_cdx_index(spark, idx_path, f"{arch}/*.warc.gz")
        assert st == {"known_files": 1, "scanned_files": 0,
                      "removed_rows": 4}
        left = spark.read.parquet(idx_path)
        assert left.count() == 3
        assert all("b.io" in r["url"] for r in left.collect())
