"""HTML -> text extraction (deequ_spark/llm/html.py): tag/entity/
whitespace semantics, script/style/head subtree removal, block-tag line
mapping, the response->text integration path, and the JVM-only plan."""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deequ_spark.llm import html_documents, html_to_text


@pytest.fixture(scope="module")
def spark():
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false").getOrCreate())


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_to_text(F.col("h"), **kw).alias("t")) \
        .collect()[0]["t"]


class TestHtmlToText:
    def test_basic_structure(self, spark):
        html = ("<html><head><title>skip me</title>"
                "<script>var x = '<p>not text</p>';</script>"
                "<style>p { color: red }</style></head>"
                "<body><h1>Title</h1><p>First para.</p>"
                "<p>Second <b>bold</b> para.</p>"
                "<!-- a comment --><ul><li>one</li><li>two</li></ul>"
                "</body></html>")
        assert _extract(spark, html) == (
            "Title\nFirst para.\nSecond bold para.\none\ntwo")

    def test_entities(self, spark):
        assert _extract(spark, "<p>a &amp; b &lt;tag&gt; &quot;q&quot;"
                               " &#39;s&#39; x&nbsp;y</p>") == \
            'a & b <tag> "q" \'s\' x y'
        # double-encoded entity decodes ONE level
        assert _extract(spark, "&amp;lt;") == "&lt;"

    def test_flat_mode(self, spark):
        html = "<div>a</div><div>b</div>"
        assert _extract(spark, html, preserve_lines=False) == "a b"
        assert _extract(spark, html) == "a\nb"

    def test_br_and_self_closing(self, spark):
        assert _extract(spark, "line one<br/>line two<br >three") == \
            "line one\nline two\nthree"

    def test_null_and_tagless(self, spark):
        df = spark.createDataFrame([(None,), ("plain text",)], "h string")
        got = [r["t"] for r in
               df.select(html_to_text(F.col("h")).alias("t")).collect()]
        assert got == [None, "plain text"]

    def test_malformed_degrades_not_raises(self, spark):
        assert _extract(spark, "<p>ok<unclosed <p>more</p>") != ""

    def test_plan_stays_jvm(self, spark):
        df = spark.createDataFrame([("<p>x</p>",)], "h string")
        out = df.select(html_to_text(F.col("h")).alias("t"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan


class TestHtmlDocuments:
    def test_responses_to_text(self, spark, tmp_path):
        from deequ_spark.llm import http_responses, read_warc
        from deequ_spark.llm.warc import build_warc_file, build_warc_record
        d = tmp_path / "html_warc"
        d.mkdir()

        def resp(url, body, status=200, ctype="text/html"):
            http = (f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}"
                    f"\r\n\r\n").encode() + body
            return build_warc_record("response", http, target_uri=url)

        recs = [
            resp("http://a.example.com/",
                 b"<html><body><p>hello &amp; welcome</p></body></html>"),
            resp("http://b.example.com/", b"{}",
                 ctype="application/json"),            # wrong type: out
            resp("http://c.example.com/", b"<p>gone</p>",
                 status=404),                          # bad status: out
            resp("http://d.example.com/",
                 b"<script>only code</script>"),       # empty text: out
        ]
        # missing Content-Type entirely: kept per the docstring contract
        http_no_type = b"HTTP/1.1 200 X\r\n\r\n<p>typeless page kept.</p>"
        recs.append(build_warc_record("response", http_no_type,
                                      target_uri="http://e.example.com/"))
        (d / "f.warc").write_bytes(build_warc_file(recs))
        docs = html_documents(http_responses(read_warc(spark, str(d))))
        rows = {r["url"]: r["text"] for r in docs.collect()}
        assert rows == {"http://a.example.com/": "hello & welcome",
                        "http://e.example.com/": "typeless page kept."}


class TestMainContent:
    """r9: link-density block scoring (boilerpipe/Arc90-style) —
    nav/footer chrome drops, body prose survives, score gauges the
    page."""

    PAGE = ("<html><head><title>skip</title></head><body>"
            "<div><a href='/'>Home</a> | <a href='/a'>About</a> | "
            "<a href='/c'>Contact</a></div>"
            "<h1>Title</h1>"
            "<p>This is the long body paragraph of the article with "
            "plenty of prose and no links at all in it.</p>"
            "<div><a href='/p'>Privacy</a> <a href='/t'>Terms</a> "
            "<a href='/i'>(c) 2026 Example Corp</a></div>"
            "</body></html>")

    def test_blocks_features(self, spark):
        from deequ_spark.llm import html_content_blocks
        df = spark.createDataFrame([(self.PAGE,)], "h string")
        rows = df.select(F.explode(html_content_blocks(F.col("h")))
                         .alias("b")).select("b.*").collect()
        by_line = {r["line"]: r for r in rows}
        nav = by_line["Home | About | Contact"]
        assert nav["anchor_chars"] == 16          # Home+About+Contact
        assert nav["link_density"] == pytest.approx(16 / 22)
        assert by_line["Title"]["anchor_chars"] == 0
        body = [r for r in rows if r["line"].startswith("This is")][0]
        assert body["link_density"] == 0.0

    def test_main_content_drops_chrome(self, spark):
        from deequ_spark.llm import html_content_score, html_main_content
        df = spark.createDataFrame([(self.PAGE,)], "h string")
        r = df.select(html_main_content(F.col("h")).alias("m"),
                      html_content_score(F.col("h")).alias("s")) \
            .collect()[0]
        assert r["m"].startswith("This is the long body paragraph")
        assert "Home" not in r["m"] and "Privacy" not in r["m"]
        assert "Title" not in r["m"]              # short line
        body_len = len("This is the long body paragraph of the article "
                       "with plenty of prose and no links at all in it.")
        total = 22 + 5 + body_len + 35
        assert r["s"] == pytest.approx(body_len / total)

    def test_unclosed_anchor_counts_to_line_end(self, spark):
        from deequ_spark.llm import html_content_blocks
        df = spark.createDataFrame(
            [("<p><a href='/x'>open link rest of line</p>",)], "h string")
        [b] = df.select(F.explode(html_content_blocks(F.col("h")))
                        .alias("b")).select("b.*").collect()
        assert b["anchor_chars"] == b["n_chars"]
        assert b["link_density"] == 1.0

    def test_sentinels_in_input_are_inert(self, spark):
        from deequ_spark.llm import html_content_blocks
        df = spark.createDataFrame(
            [("<p>evil \x01 bytes \x02 inside a normal paragraph that "
              "is otherwise fine</p>",)], "h string")
        [b] = df.select(F.explode(html_content_blocks(F.col("h")))
                        .alias("b")).select("b.*").collect()
        assert b["anchor_chars"] == 0
        assert "\x01" not in b["line"] and "\x02" not in b["line"]

    def test_null_and_empty(self, spark):
        from deequ_spark.llm import html_content_score, html_main_content
        df = spark.createDataFrame([(None,), ("<br>",)], "h string")
        rows = df.select(html_main_content(F.col("h")).alias("m"),
                         html_content_score(F.col("h")).alias("s")) \
            .collect()
        assert rows[0]["m"] is None and rows[0]["s"] is None
        assert rows[1]["m"] == "" and rows[1]["s"] is None  # no chars

    def test_html_documents_main_content_mode(self, spark, tmp_path):
        from deequ_spark.llm import html_documents
        from deequ_spark.llm.warc import (build_warc_file,
                                          build_warc_record,
                                          http_responses, read_warc)
        d = tmp_path / "warc_mc"
        d.mkdir()
        body = self.PAGE.encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body)
        rec = build_warc_record("response", http,
                                target_uri="http://m.example.com/")
        (d / "f.warc").write_bytes(build_warc_file([rec]))
        docs = html_documents(http_responses(read_warc(spark, str(d))),
                              main_content=True)
        [r] = docs.collect()
        assert r["text"].startswith("This is the long body")
        assert 0.4 < r["content_score"] < 0.8
        assert docs.columns == ["url", "text", "content_score"]

    def test_plan_stays_jvm(self, spark):
        from deequ_spark.llm import html_content_score, html_main_content
        df = spark.createDataFrame([(self.PAGE,)], "h string")
        out = df.select(html_main_content(F.col("h")).alias("m"),
                        html_content_score(F.col("h")).alias("s"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_inline_anchor_does_not_fuse_words(self, spark):
        """r9 review fix: <a>/<​a> became zero-width sentinels and
        fused adjacent words ('foo<a>bar</a>baz' -> 'foobarbaz') while
        html_to_text yields 'foo bar baz' — tags must still act as
        separators in the content path."""
        from deequ_spark.llm import html_main_content, html_to_text
        h = ("<p>foo<a href='/x'>bar</a>baz plus thirty more chars of "
             "plain prose to pass the minimum</p>")
        df = spark.createDataFrame([(h,)], "h string")
        r = df.select(html_to_text(F.col("h")).alias("t"),
                      html_main_content(F.col("h"),
                                        max_link_density=0.5).alias("m")) \
            .collect()[0]
        assert r["t"].startswith("foo bar baz")
        assert r["m"] == r["t"]


class TestHtmlMetadata:
    def test_fields_extracted_and_decoded(self, spark):
        from deequ_spark.llm import html_metadata
        page = ("<html><head><title> Fast &amp; <b>Loose</b>\n guide "
                "</title>"
                '<meta name="description" content="A &quot;nice&quot; page">'
                '<link rel="canonical" href="http://ex.com/real">'
                '<meta name="robots" content="NOINDEX, follow">'
                "</head><body>x</body></html>")
        df = spark.createDataFrame([(page,)], "html string")
        [r] = df.select(html_metadata("html").alias("m")).collect()
        m = r["m"]
        assert m["title"] == "Fast & Loose guide"
        assert m["meta_description"] == 'A "nice" page'
        assert m["canonical_url"] == "http://ex.com/real"
        assert m["noindex"] is True and m["nofollow"] is False

    def test_attribute_order_variants_and_absent_fields(self, spark):
        from deequ_spark.llm import html_metadata
        page = ('<meta content="rev order desc" name="description">'
                '<link href="http://c.com/x" rel="canonical">')
        df = spark.createDataFrame([(page,), ("<p>no head</p>",)],
                                   "html string")
        rows = df.select(html_metadata("html").alias("m")).collect()
        m0 = rows[0]["m"]
        assert m0["meta_description"] == "rev order desc"
        assert m0["canonical_url"] == "http://c.com/x"
        m1 = rows[1]["m"]
        assert m1["title"] is None
        assert m1["meta_description"] is None
        assert m1["canonical_url"] is None
        assert m1["noindex"] is False and m1["nofollow"] is False

    def test_canonical_feeds_url_dedup(self, spark):
        from deequ_spark.llm import html_metadata
        from deequ_spark.llm.urls import url_deduplicate
        from pyspark.sql import functions as F
        pages = spark.createDataFrame(
            [(1, "http://mirror1.com/a",
              '<link rel="canonical" href="http://orig.com/a">'),
             (2, "http://mirror2.com/a",
              '<link rel="canonical" href="http://orig.com/a">'),
             (3, "http://other.com/b", "<p>no canonical</p>")],
            "id int, url string, html string")
        with_canon = pages.withColumn(
            "eff_url", F.coalesce(
                html_metadata("html")["canonical_url"], F.col("url")))
        kept = url_deduplicate(with_canon, "id", "eff_url")
        assert kept.count() == 2  # mirrors collapse onto the canonical

    def test_attribute_boundaries_and_quote_keyed_content(self, spark):
        from deequ_spark.llm import html_metadata
        page = ('<meta name="robots-override" content="noindex">'
                '<meta name="description-policy" content="internal">'
                '<link rel="canonicalize" href="http://wrong.com/x">'
                '<meta name="description" content="It\'s a great page">')
        df = spark.createDataFrame([(page,)], "html string")
        [r] = df.select(html_metadata("html").alias("m")).collect()
        m = r["m"]
        assert m["noindex"] is False      # robots-override is NOT robots
        assert m["canonical_url"] is None  # canonicalize != canonical
        # apostrophe inside double-quoted content survives
        assert m["meta_description"] == "It's a great page"
