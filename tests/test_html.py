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
