"""Sitemap parsing + frontier (deequ_spark/llm/sitemap.py)."""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deequ_spark.llm import parse_robots, parse_sitemap, sitemap_frontier


@pytest.fixture(scope="module")
def spark():
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false").getOrCreate())


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://a.example.com/page1 </loc>
       <lastmod>2026-01-01</lastmod></url>
  <url><loc>https://a.example.com/search?q=x&amp;page=2</loc></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://a.example.com/sitemap-news.xml</loc></sitemap>
  <sitemap><loc>https://a.example.com/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>"""


class TestParse:
    def test_urlset_entries_trimmed_and_decoded(self, spark):
        df = spark.createDataFrame(
            [("https://a.example.com/sitemap.xml", SITEMAP)],
            "url string, body string")
        rows = sorted((r["kind"], r["loc"]) for r in
                      parse_sitemap(df, "url", "body").collect())
        assert rows == [
            ("url", "https://a.example.com/page1"),
            ("url", "https://a.example.com/search?q=x&page=2")]

    def test_index_entries_are_sitemap_kind(self, spark):
        df = spark.createDataFrame(
            [("https://a.example.com/sitemap.xml", INDEX)],
            "url string, body string")
        rows = {(r["kind"], r["loc"]) for r in
                parse_sitemap(df, "url", "body").collect()}
        assert rows == {
            ("sitemap", "https://a.example.com/sitemap-news.xml"),
            ("sitemap", "https://a.example.com/sitemap-2.xml.gz")}

    def test_host_scope_is_fetch_host(self, spark):
        df = spark.createDataFrame(
            [("https://WWW.b.example.com:443/sm.xml",
              "<urlset><url><loc>https://other.com/x</loc></url></urlset>")],
            "url string, body string")
        [r] = parse_sitemap(df, "url", "body").collect()
        assert r["host"] == "www.b.example.com"
        assert r["loc"] == "https://other.com/x"

    def test_entry_cap_document_order(self, spark):
        body = "<urlset>" + "".join(
            f"<url><loc>https://a.com/p{i}</loc></url>"
            for i in range(100)) + "</urlset>"
        df = spark.createDataFrame([("https://a.com/s.xml", body)],
                                   "url string, body string")
        locs = [r["loc"] for r in
                parse_sitemap(df, "url", "body",
                              max_entries=10).collect()]
        assert locs == [f"https://a.com/p{i}" for i in range(10)]

    def test_malformed_degrades_to_fewer_rows(self, spark):
        df = spark.createDataFrame(
            [("https://a.com/s.xml",
              "<urlset><url><loc>https://a.com/ok</loc></url>"
              "<url><loc>unterminated")],
            "url string, body string")
        rows = [r["loc"] for r in
                parse_sitemap(df, "url", "body").collect()]
        assert rows == ["https://a.com/ok"]


class TestFrontier:
    def test_cross_host_spam_dropped_and_robots_applied(self, spark):
        sitemaps = spark.createDataFrame(
            [("https://a.example.com/sitemap.xml",
              "<urlset>"
              "<url><loc>https://a.example.com/keep</loc></url>"
              "<url><loc>https://a.example.com/private/x</loc></url>"
              "<url><loc>https://evil.com/spam</loc></url>"
              "</urlset>")],
            "url string, body string")
        robots = spark.createDataFrame(
            [("https://a.example.com/robots.txt",
              "User-agent: *\nDisallow: /private/\n")],
            "url string, body string")
        rules = parse_robots(robots, "url", "body")
        got = {r["url"] for r in
               sitemap_frontier(sitemaps, rules).collect()}
        assert got == {"https://a.example.com/keep"}

    def test_plan_stays_jvm_and_broadcast(self, spark):
        sitemaps = spark.createDataFrame(
            [("https://a.com/s.xml",
              "<urlset><url><loc>https://a.com/x</loc></url></urlset>")],
            "url string, body string")
        rules = spark.createDataFrame(
            [("a.com", "disallow", "/nope/")],
            "host string, rule string, prefix string")
        out = sitemap_frontier(sitemaps, rules)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan
