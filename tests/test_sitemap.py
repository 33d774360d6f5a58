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


class TestFetchSchedule:
    def test_per_host_slots_respect_delay(self, spark):
        from deequ_spark.llm import fetch_schedule
        urls = spark.createDataFrame(
            [(f"http://a.com/p{i}",) for i in range(4)]
            + [(f"http://b.com/q{i}",) for i in range(3)], "url string")
        delays = spark.createDataFrame(
            [("a.com", 2.0)], "host string, crawl_delay_s double")
        got = {(r["host"], r["fetch_rank"]): r["scheduled_at"]
               for r in fetch_schedule(urls, delays=delays,
                                       default_delay_s=0.5,
                                       start_ts=100.0).collect()}
        # a.com: crawl-delay 2s; b.com falls back to the 0.5s default
        assert got[("a.com", 1)] == 100.0
        assert got[("a.com", 4)] == 106.0
        assert got[("b.com", 3)] == 101.0

    def test_duplicate_delay_rows_do_not_fan_out(self, spark):
        # per-agent-group robots parsing yields duplicate host rows in
        # the delays table; the join must not duplicate frontier rows —
        # one slot per url, with the max (most polite) delay winning
        from deequ_spark.llm import fetch_schedule
        urls = spark.createDataFrame(
            [(f"http://a.com/p{i}",) for i in range(3)], "url string")
        delays = spark.createDataFrame(
            [("a.com", 1.0), ("a.com", 3.0), ("a.com", 1.0)],
            "host string, crawl_delay_s double")
        rows = fetch_schedule(urls, delays=delays,
                              start_ts=10.0).collect()
        assert len(rows) == 3
        assert sorted(r["fetch_rank"] for r in rows) == [1, 2, 3]
        got = {r["fetch_rank"]: r["scheduled_at"] for r in rows}
        assert got == {1: 10.0, 2: 13.0, 3: 16.0}

    def test_deterministic_rank_and_quota(self, spark):
        from deequ_spark.llm import fetch_schedule
        import random
        rows = [(f"http://h.com/{i:03d}",) for i in range(50)]
        random.Random(3).shuffle(rows)
        df = spark.createDataFrame(rows, "url string").repartition(7)
        a = fetch_schedule(df, max_per_host=10).collect()
        assert len(a) == 10  # quota applied
        ranks = {r["url"]: r["fetch_rank"] for r in a}
        # lexicographic rank: the 10 smallest URLs survive, in order
        assert sorted(ranks) == [f"http://h.com/{i:03d}" for i in range(10)]
        b = {r["url"]: r["fetch_rank"]
             for r in fetch_schedule(df, max_per_host=10).collect()}
        assert b == ranks  # re-run produces the identical plan

    def test_null_urls_dropped_and_validation(self, spark):
        from deequ_spark.llm import fetch_schedule
        import pytest as _pytest
        df = spark.createDataFrame([("http://x.com/a",), (None,)],
                                   "url string")
        assert fetch_schedule(df).count() == 1
        with _pytest.raises(ValueError):
            fetch_schedule(df, default_delay_s=-1)

    def test_priority_ordering_keeps_best_under_quota(self, spark):
        from deequ_spark.llm import fetch_schedule
        rows = [(f"http://h.com/p{i}", float(i % 10)) for i in range(30)]
        df = spark.createDataFrame(rows, "url string, score double")
        got = fetch_schedule(df, priority_col="score",
                             max_per_host=5).collect()
        assert len(got) == 5
        kept = {r["url"] for r in got}
        # quota keeps the HIGHEST-scored pages (score 9 x3, then 8s)
        assert all(r["url"].endswith(("9", "19", "29", "8", "18"))
                   for r in got), kept
        first = min(got, key=lambda r: r["fetch_rank"])
        assert first["url"] == "http://h.com/p19"  # score 9, url asc


class TestParseFeed:
    RSS = ("<?xml version='1.0'?><rss><channel>"
           "<title>Site feed</title><link>http://s.com/</link>"
           "<item><title>Post &amp; notes</title>"
           "<link>http://s.com/post1</link>"
           "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
           "<item><link> http://s.com/post2 </link></item>"
           "</channel></rss>")
    ATOM = ("<feed xmlns='http://www.w3.org/2005/Atom'>"
            "<title>blog</title>"
            "<entry><title>Entry one</title>"
            "<link href='http://b.com/a1'/>"
            "<updated>2024-02-02T10:00:00Z</updated></entry>"
            "<entry><link href=\"http://b.com/a2\"/></entry>"
            "</feed>")

    def test_rss_and_atom_entries(self, spark):
        from deequ_spark.llm import parse_feed
        df = spark.createDataFrame(
            [("http://s.com/feed.xml", self.RSS),
             ("http://b.com/atom.xml", self.ATOM)],
            "url string, body string")
        rows = {(r["feed_url"], r["entry_url"], r["title"], r["published"])
                for r in parse_feed(df, "url", "body").collect()}
        assert rows == {
            ("http://s.com/feed.xml", "http://s.com/post1",
             "Post & notes", "Mon, 01 Jan 2024 00:00:00 GMT"),
            ("http://s.com/feed.xml", "http://s.com/post2", None, None),
            ("http://b.com/atom.xml", "http://b.com/a1", "Entry one",
             "2024-02-02T10:00:00Z"),
            ("http://b.com/atom.xml", "http://b.com/a2", None, None)}
        # channel-level title/link never leak into entries
        assert not any(t == "Site feed" or t == "blog"
                       for _, _, t, _ in rows)

    def test_malformed_degrades_to_no_rows(self, spark):
        from deequ_spark.llm import parse_feed
        df = spark.createDataFrame(
            [("http://x.com/f", "<rss><item><title>no link"),
             ("http://y.com/f", "not xml at all")],
            "url string, body string")
        assert parse_feed(df, "url", "body").count() == 0

    def test_feeds_compose_with_fetch_schedule(self, spark):
        from deequ_spark.llm import fetch_schedule, parse_feed
        df = spark.createDataFrame(
            [("http://s.com/feed.xml", self.RSS)], "url string, body string")
        entries = parse_feed(df, "url", "body") \
            .withColumnRenamed("entry_url", "url")
        plan = fetch_schedule(entries, default_delay_s=2.0).collect()
        assert {r["fetch_rank"] for r in plan} == {1, 2}
        assert all(r["host"] == "s.com" for r in plan)


class TestDiscoverFeeds:
    def test_rel_alternate_feeds_found_any_attr_order(self, spark):
        from deequ_spark.llm import discover_feeds
        html = ('<head>'
                '<link rel="alternate" type="application/rss+xml"'
                ' href="/feed.xml">'
                '<link type="application/atom+xml" href="http://s.com/a"'
                " rel='alternate'>"
                '<link rel="stylesheet" href="/style.css">'
                '<link rel="alternate" type="text/html" href="/mobile">'
                "</head>")
        df = spark.createDataFrame([("http://s.com/p", html)],
                                   "url string, html string")
        rows = {(r["feed_url"], r["feed_type"]) for r in
                discover_feeds(df, "url", "html").collect()}
        assert rows == {("/feed.xml", "rss"), ("http://s.com/a", "atom")}

    def test_rel_boundary_no_false_positives(self, spark):
        from deequ_spark.llm import discover_feeds
        html = ('<link rel="alternates" type="application/rss+xml"'
                ' href="/x">')
        df = spark.createDataFrame([("http://s.com/", html)],
                                   "url string, html string")
        assert discover_feeds(df, "url", "html").count() == 0

    def test_atom_rel_self_links_skipped(self, spark):
        from deequ_spark.llm import parse_feed
        atom = ("<feed><entry>"
                "<link rel='self' href='http://api.b.com/entry/1'/>"
                "<link rel='alternate' href='http://b.com/post1'/>"
                "</entry><entry>"
                "<link rel='edit' href='http://api.b.com/e2'/>"
                "<link href='http://b.com/post2'/>"  # absent rel = alternate
                "</entry></feed>")
        df = spark.createDataFrame([("http://b.com/atom", atom)],
                                   "url string, body string")
        urls = {r["entry_url"] for r in
                parse_feed(df, "url", "body").collect()}
        assert urls == {"http://b.com/post1", "http://b.com/post2"}

    def test_rss_cdata_title_and_no_body_href_injection(self, spark):
        from deequ_spark.llm import parse_feed
        rss = ("<rss><channel><item>"
               "<title><![CDATA[Hello <b>x</b> &amp; y]]></title>"
               "<link>http://s.com/p1</link></item>"
               "<item><description><![CDATA[spam <link "
               "href='http://evil.test/x'> here]]></description>"
               "</item></channel></rss>")
        df = spark.createDataFrame([("http://s.com/f", rss)],
                                   "url string, body string")
        rows = parse_feed(df, "url", "body").collect()
        # item 2 has NO <link>text</link> — the CDATA href must NOT
        # inject a frontier URL
        assert {r["entry_url"] for r in rows} == {"http://s.com/p1"}
        [r1] = [r for r in rows if r["entry_url"] == "http://s.com/p1"]
        assert r1["title"] == "Hello x & y"

    def test_discover_feeds_entity_decode_and_rel_token_set(self, spark):
        from deequ_spark.llm import discover_feeds
        html = ('<link rel="nofollow alternate" '
                'type="application/rss+xml" href="/f?a=1&amp;b=2">')
        df = spark.createDataFrame([("http://s.com/", html)],
                                   "url string, html string")
        [r] = discover_feeds(df, "url", "html").collect()
        assert r["feed_url"] == "/f?a=1&b=2"
        assert r["feed_type"] == "rss"
