"""robots.txt parsing + URL filtering (deequ_spark/llm/robots.py):
section extraction, rule parsing, RFC 9309 longest-match precedence,
broadcast plan shape."""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deequ_spark.llm import filter_disallowed, parse_robots, url_path


@pytest.fixture(scope="module")
def spark():
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false").getOrCreate())


ROBOTS_A = """# comments are fine
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp/
Allow: /private/public/
Disallow:
"""

ROBOTS_B = """User-agent: *
Disallow: /
Allow: /blog/
"""


@pytest.fixture()
def rules(spark):
    df = spark.createDataFrame(
        [("http://a.example.com/robots.txt", ROBOTS_A),
         ("http://b.example.com/robots.txt", ROBOTS_B)],
        "url string, body string")
    return parse_robots(df, "url", "body")


class TestParse:
    def test_star_section_host_scoped(self, spark, rules):
        got = {(r["host"], r["rule"], r["prefix"])
               for r in rules.collect()}
        assert got == {
            ("a.example.com", "disallow", "/private/"),
            ("a.example.com", "disallow", "/tmp/"),
            ("a.example.com", "allow", "/private/public/"),
            ("b.example.com", "disallow", "/"),
            ("b.example.com", "allow", "/blog/"),
        }

    def test_specific_agent(self, spark):
        df = spark.createDataFrame(
            [("http://a.example.com/robots.txt", ROBOTS_A)],
            "url string, body string")
        got = {(r["rule"], r["prefix"]) for r in
               parse_robots(df, "url", "body",
                            user_agent="googlebot").collect()}
        assert got == {("disallow", "/google-only/")}

    def test_specific_agent_falls_back_to_star(self, spark):
        """RFC 9309 2.2.1: no matching group -> the * group applies."""
        df = spark.createDataFrame(
            [("http://a.example.com/robots.txt", ROBOTS_A)],
            "url string, body string")
        got = {(r["rule"], r["prefix"]) for r in
               parse_robots(df, "url", "body",
                            user_agent="otherbot").collect()}
        assert got == {("disallow", "/private/"),
                       ("disallow", "/tmp/"),
                       ("allow", "/private/public/")}

    def test_multiple_groups_for_same_agent_merge(self, spark):
        """RFC 9309 2.2.1: rules from ALL groups for an agent combine."""
        body = ("User-agent: *\nDisallow: /a/\n\n"
                "User-agent: bot\nDisallow: /x/\n\n"
                "User-agent: *\nDisallow: /b/\n")
        df = spark.createDataFrame(
            [("http://h.example.com/robots.txt", body)],
            "url string, body string")
        got = {r["prefix"] for r in
               parse_robots(df, "url", "body").collect()}
        assert got == {"/a/", "/b/"}

    def test_url_path(self, spark):
        df = spark.createDataFrame(
            [("http://x.com",), ("https://x.com/a/b?q=1#f",)],
            "u string")
        got = [r["p"] for r in
               df.select(url_path("u").alias("p")).collect()]
        assert got == ["/", "/a/b"]


class TestFilter:
    def test_longest_match_precedence_host_scoped(self, spark):
        df = spark.createDataFrame(
            [("http://a.example.com/robots.txt", ROBOTS_A)],
            "url string, body string")
        rules = parse_robots(df, "url", "body")
        urls = spark.createDataFrame([
            ("http://a.example.com/page",),              # no match: keep
            ("http://a.example.com/private/x",),         # disallow
            ("http://a.example.com/private/public/x",),  # allow wins
            ("http://A.EXAMPLE.com:80/tmp/y",),          # disallow (case/port)
            ("http://www.example.com/private/x",),       # SIBLING host: keep
            ("http://other.com/private/x",),             # no rules: keep
        ], "url string")
        kept = {r["url"] for r in
                filter_disallowed(urls, rules).collect()}
        assert kept == {"http://a.example.com/page",
                        "http://a.example.com/private/public/x",
                        "http://www.example.com/private/x",
                        "http://other.com/private/x"}
        dropped = {r["url"] for r in
                   filter_disallowed(urls, rules,
                                     keep_disallowed=True).collect()}
        assert dropped == {"http://a.example.com/private/x",
                           "http://A.EXAMPLE.com:80/tmp/y"}

    def test_disallow_all_with_carveout(self, spark):
        df = spark.createDataFrame(
            [("http://b.example.org/robots.txt", ROBOTS_B)],
            "url string, body string")
        rules = parse_robots(df, "url", "body")
        urls = spark.createDataFrame(
            [("http://b.example.org/blog/post",),
             ("http://b.example.org/anything",)], "url string")
        kept = {r["url"] for r in
                filter_disallowed(urls, rules).collect()}
        assert kept == {"http://b.example.org/blog/post"}

    def test_hostile_rule_count_bounded(self, spark):
        """r9 (RFC 9309 §2.5): a hostile/broken host with 10⁵
        Disallow lines must not inflate the per-host broadcast arrays
        — parse_robots caps rules per body (document order, like a
        truncating fetcher) and filter_disallowed caps per host."""
        body = "User-agent: *\n" + "\n".join(
            f"Disallow: /junk{i}/" for i in range(100_000))
        df = spark.createDataFrame(
            [("http://evil.example.com/robots.txt", body)],
            "url string, body string")
        rules = parse_robots(df, "url", "body", max_rules=1000)
        assert rules.count() == 1000
        # document order: the FIRST 1000 rules survive
        got = {r["prefix"] for r in rules.collect()}
        assert "/junk0/" in got and "/junk999/" in got
        assert "/junk1000/" not in got
        # per-host belt: arrays collected for the broadcast stay bounded
        urls = spark.createDataFrame(
            [("http://evil.example.com/junk5/x",),
             ("http://evil.example.com/fine",)], "url string")
        kept = {r["url"] for r in
                filter_disallowed(urls, rules,
                                  max_rules_per_host=64).collect()}
        assert "http://evil.example.com/fine" in kept

    def test_default_caps_inert_on_small_files(self, spark, rules):
        """The default caps must not change behavior for real-world
        robots files (all fixtures are far below both caps)."""
        uncapped = parse_robots(spark.createDataFrame(
            [("http://a.example.com/robots.txt", ROBOTS_A)],
            "url string, body string"), "url", "body",
            max_body_bytes=None, max_rules=None)
        capped = parse_robots(spark.createDataFrame(
            [("http://a.example.com/robots.txt", ROBOTS_A)],
            "url string, body string"), "url", "body")
        assert sorted(map(tuple, uncapped.collect())) == \
            sorted(map(tuple, capped.collect()))

    def test_per_host_cap_keeps_longest_prefixes(self, spark):
        """Under longest-match precedence the capped per-host arrays
        keep the LONGEST prefixes — the ones that can still override."""
        rules = spark.createDataFrame(
            [("h.com", "disallow", "/a/"),
             ("h.com", "disallow", "/a/b/c/d/e/"),
             ("h.com", "allow", "/a/b/"),
             ("h.com", "allow", "/a/b/c/")],
            "host string, rule string, prefix string")
        urls = spark.createDataFrame(
            [("http://h.com/a/x",), ("http://h.com/a/b/c/x",),
             ("http://h.com/a/b/c/d/e/x",)], "url string")
        # cap 1 per rule-kind: keeps disallow /a/b/c/d/e/ and allow
        # /a/b/c/ — /a/x loses its matching disallow and is kept
        kept = {r["url"] for r in
                filter_disallowed(urls, rules,
                                  max_rules_per_host=1).collect()}
        assert kept == {"http://h.com/a/x", "http://h.com/a/b/c/x"}

    def test_broadcast_plan(self, spark, rules):
        urls = spark.range(100).selectExpr(
            "concat('http://a.example.com/p/', id) AS url")
        out = filter_disallowed(urls, rules)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:1200]


class TestRobotsProperty:
    """Hypothesis: filter_disallowed over random rules/paths equals a
    pure-Python RFC 9309 longest-match reference model."""

    def test_matches_reference_model(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        seg = st.text(alphabet="abc", min_size=1, max_size=2)
        prefix = st.builds(lambda parts: "/" + "/".join(parts),
                           st.lists(seg, min_size=1, max_size=3))
        rules_s = st.lists(
            st.tuples(st.sampled_from(["allow", "disallow"]), prefix),
            min_size=0, max_size=6)
        paths_s = st.lists(prefix, min_size=1, max_size=8)

        def ref_allowed(rules, path):
            best_len, best_rule = -1, "allow"
            for rule, p in rules:
                if path.startswith(p):
                    # longest wins; ties favor allow
                    if len(p) > best_len or (len(p) == best_len
                                             and rule == "allow"):
                        best_len, best_rule = len(p), rule
            return best_rule == "allow"

        @given(rules_s, paths_s)
        @settings(max_examples=12, deadline=None)
        def check(rules, paths):
            rules_df = spark.createDataFrame(
                [("h.example.com", r, p) for r, p in rules] or
                [("other.example.com", "disallow", "/zzz/")],
                "host string, rule string, prefix string")
            urls = spark.createDataFrame(
                [(f"http://h.example.com{p}",) for p in paths],
                "url string")
            kept = {r["url"] for r in
                    filter_disallowed(urls, rules_df).collect()}
            want = {f"http://h.example.com{p}" for p in paths
                    if ref_allowed(rules if rules else [], p)}
            assert kept == want

        check()


class TestDirectives:
    BODY = """User-agent: googlebot
Crawl-delay: 2.5
Disallow: /g/

User-agent: *
Crawl-delay: 10
Crawl-delay: 99
Disallow: /private/

Sitemap: https://a.example.com/sitemap.xml
Sitemap: https://a.example.com/sitemap-news.xml
"""

    def _df(self, spark):
        from deequ_spark.llm import parse_robots_directives
        df = spark.createDataFrame(
            [("http://a.example.com/robots.txt", self.BODY)],
            "url string, body string")
        return df, parse_robots_directives

    def test_crawl_delay_agent_scoped_first_wins(self, spark):
        df, parse = self._df(spark)
        [r] = parse(df, "url", "body").collect()
        assert r["host"] == "a.example.com"
        assert r["crawl_delay"] == 10.0          # * group, first value
        [g] = parse(df, "url", "body", user_agent="googlebot").collect()
        assert g["crawl_delay"] == 2.5           # own group beats *

    def test_sitemaps_are_global(self, spark):
        df, parse = self._df(spark)
        [g] = parse(df, "url", "body", user_agent="googlebot").collect()
        assert list(g["sitemaps"]) == [
            "https://a.example.com/sitemap.xml",
            "https://a.example.com/sitemap-news.xml"]

    def test_absent_and_garbage_delay_null(self, spark):
        from deequ_spark.llm import parse_robots_directives
        df = spark.createDataFrame(
            [("http://b.com/robots.txt",
              "User-agent: *\nCrawl-delay: soon\nDisallow: /x/\n"),
             ("http://c.com/robots.txt", "User-agent: *\nDisallow:\n")],
            "url string, body string")
        got = {r["host"]: (r["crawl_delay"], list(r["sitemaps"])) for r in
               parse_robots_directives(df, "url", "body").collect()}
        assert got == {"b.com": (None, []), "c.com": (None, [])}

    def test_feeds_sitemap_module(self, spark):
        """Directive -> fetch -> parse: the Sitemap: URL from robots is
        exactly what sitemap_frontier consumes downstream."""
        from deequ_spark.llm import (parse_robots, parse_robots_directives,
                                     sitemap_frontier)
        robots = spark.createDataFrame(
            [("http://a.example.com/robots.txt",
              "User-agent: *\nDisallow: /private/\n"
              "Sitemap: https://a.example.com/sm.xml\n")],
            "url string, body string")
        [d] = parse_robots_directives(robots, "url", "body").collect()
        fetched_url = d["sitemaps"][0]
        sitemaps = spark.createDataFrame(
            [(fetched_url,
              "<urlset><url><loc>https://a.example.com/ok</loc></url>"
              "<url><loc>https://a.example.com/private/x</loc></url>"
              "</urlset>")],
            "url string, body string")
        rules = parse_robots(robots, "url", "body")
        got = {r["url"] for r in
               sitemap_frontier(sitemaps, rules).collect()}
        assert got == {"https://a.example.com/ok"}
