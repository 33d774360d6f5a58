"""robots.txt parsing and URL filtering — the crawl-politeness /
compliance stage of an ingest pipeline: given the robots.txt bodies a
crawler fetched (they are just response records), which of the corpus
URLs was the crawler allowed to keep?

JVM-side design: the ``User-agent`` section of interest is cut out with
one regexp (sections run until the next ``User-agent:`` header), its
``Disallow``/``Allow`` prefixes extracted with ``regexp_extract_all`` —
no Python in the parse. Matching aggregates each domain's rules to ONE
row (array of prefixes) and broadcast-joins them onto the URL table:
robots rules are per-domain metadata, thousands of times smaller than a
corpus, the textbook broadcast side. Longest-prefix-wins precedence
(the REP standard, RFC 9309 §2.2.2): a URL is disallowed iff the
longest matching prefix among Allow+Disallow rules is a Disallow.
``Disallow:`` with an empty value means allow-all (per RFC); wildcard
``*``/``$`` patterns are intentionally out of scope (rarely load-
bearing; a pandas-UDF matcher slots in at the same join seam).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import extract_domain

__all__ = ["parse_robots", "filter_disallowed", "url_path"]


def url_path(url) -> Column:
    """Path component of a URL (leading '/', no query/fragment); bare
    hosts yield '/'."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    return F.when(F.length(path) == 0, F.lit("/")).otherwise(path)


def parse_robots(df: DataFrame, url_col: str, body_col: str,
                 user_agent: str = "*") -> DataFrame:
    """Parse robots.txt bodies into ``(domain, rule, prefix)`` rows for
    the section addressed to ``user_agent`` (falling back to nothing if
    that section is absent — absent rules mean allow-all, which is the
    no-row default downstream). ``rule`` ∈ {'allow', 'disallow'};
    empty-valued ``Disallow:`` lines are skipped per RFC 9309."""
    import re as _re
    ua = _re.escape(user_agent)
    section = F.regexp_extract(
        F.col(body_col),
        rf"(?is)user-agent:[ \t]*{ua}[ \t]*\r?\n(.*?)"
        rf"(?=(?:\r?\n)[ \t]*user-agent:|$)", 1)
    dis = F.regexp_extract_all(section,
                               F.lit(r"(?im)^[ \t]*disallow:[ \t]*"
                                     r"([^#\s]+)"), 1)
    alw = F.regexp_extract_all(section,
                               F.lit(r"(?im)^[ \t]*allow:[ \t]*"
                                     r"([^#\s]+)"), 1)
    base = df.select(extract_domain(F.col(url_col)).alias("domain"),
                     dis.alias("__d"), alw.alias("__a"))
    out_d = base.select("domain", F.lit("disallow").alias("rule"),
                        F.explode("__d").alias("prefix"))
    out_a = base.select("domain", F.lit("allow").alias("rule"),
                        F.explode("__a").alias("prefix"))
    return out_d.unionByName(out_a)


def filter_disallowed(urls: DataFrame, rules: DataFrame,
                      url_col: str = "url",
                      keep_disallowed: bool = False) -> DataFrame:
    """Drop (or keep, with ``keep_disallowed``) URLs whose path is
    disallowed by their domain's rules, RFC 9309 longest-match
    precedence: among all matching Allow/Disallow prefixes the longest
    wins; ties favor Allow; no matching rule (or no rules for the
    domain) means allowed.

    Plan: rules collapse to ONE row per domain (two collected prefix
    arrays — bounded: real robots files are small) and broadcast-join
    onto the URL table; the match is one ``aggregate`` fold over the
    arrays per URL. No shuffle of the corpus."""
    per_domain = (rules.groupBy("domain").agg(
        F.collect_list(F.when(F.col("rule") == "disallow",
                              F.col("prefix"))).alias("__dis"),
        F.collect_list(F.when(F.col("rule") == "allow",
                              F.col("prefix"))).alias("__alw")))
    u = urls.withColumn("__dom", extract_domain(F.col(url_col))) \
            .withColumn("__path", url_path(F.col(url_col)))
    joined = u.join(F.broadcast(per_domain),
                    u["__dom"] == per_domain["domain"], "left")

    def longest_match(arr):
        return F.aggregate(
            F.coalesce(arr, F.array().cast("array<string>")),
            F.lit(-1),
            lambda acc, p: F.when(
                F.col("__path").startswith(p) & (F.length(p) > acc),
                F.length(p)).otherwise(acc))

    dis_len = longest_match(F.col("__dis"))
    alw_len = longest_match(F.col("__alw"))
    disallowed = dis_len > alw_len          # tie -> allow (RFC 9309)
    cond = disallowed if keep_disallowed else ~disallowed
    return joined.where(cond).select(*urls.columns)
