"""robots.txt parsing and URL filtering — the crawl-politeness /
compliance stage of an ingest pipeline: given the robots.txt bodies a
crawler fetched (they are just response records), which of the corpus
URLs was the crawler allowed to keep?

JVM-side design: ALL sections addressed to the user agent are cut out
with one ``regexp_extract_all`` (multiple groups for the same agent
merge, RFC 9309 §2.2.1) and their ``Disallow``/``Allow`` prefixes
extracted with a second ``regexp_extract_all`` — no Python in the
parse; a specific agent with no section of its own falls back to the
``*`` group, as the RFC mandates. Matching scopes rules by HOST
(robots.txt governs exactly the host it was fetched from, §2.3),
aggregates each host's rules to ONE row (array of prefixes) and
broadcast-joins them onto the URL table: robots rules are per-host
metadata, thousands of times smaller than a corpus, the textbook
broadcast side. Longest-prefix-wins precedence (§2.2.2): a URL is
disallowed iff the longest matching prefix among Allow+Disallow rules
is a Disallow; ties favor Allow. ``Disallow:`` with an empty value
means allow-all; wildcard ``*``/``$`` patterns are intentionally out
of scope (rarely load-bearing; a pandas-UDF matcher slots in at the
same join seam).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots", "filter_disallowed", "url_path", "url_host"]


def url_host(url) -> Column:
    """Lowercased host of a URL (userinfo and port stripped) — robots
    rules scope to the exact HOST they were fetched from (RFC 9309
    §2.3), never to the registrable domain: blog.example.com's
    robots.txt says nothing about www.example.com."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    return F.lower(F.regexp_replace(
        F.regexp_replace(hostport, r"^[^@]*@", ""), r":\d+$", ""))


def url_path(url) -> Column:
    """Path component of a URL (leading '/', no query/fragment); bare
    hosts yield '/'."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    return F.when(F.length(path) == 0, F.lit("/")).otherwise(path)


def _sections_for(body: Column, agent_re: str) -> Column:
    """ALL rule sections addressed to an agent, concatenated — multiple
    groups for the same agent merge per RFC 9309 §2.2.1."""
    return F.array_join(F.regexp_extract_all(
        body,
        F.lit(rf"(?is)user-agent:[ \t]*{agent_re}[ \t]*\r?\n(.*?)"
              rf"(?=(?:\r?\n)[ \t]*user-agent:|$)"), 1), "\n")


def parse_robots(df: DataFrame, url_col: str, body_col: str,
                 user_agent: str = "*") -> DataFrame:
    """Parse robots.txt bodies into ``(host, rule, prefix)`` rows for
    the section(s) addressed to ``user_agent`` — multiple groups merge,
    and a specific agent with NO group of its own obeys the ``*`` group
    (RFC 9309 §2.2.1). ``rule`` ∈ {'allow', 'disallow'}; empty-valued
    ``Disallow:`` lines are skipped (allow-all)."""
    import re as _re
    body = F.col(body_col)
    section = _sections_for(body, _re.escape(user_agent))
    if user_agent != "*":
        star = _sections_for(body, _re.escape("*"))
        section = F.when(F.length(F.trim(section)) > 0, section) \
            .otherwise(star)
    dis = F.regexp_extract_all(section,
                               F.lit(r"(?im)^[ \t]*disallow:[ \t]*"
                                     r"([^#\s]+)"), 1)
    alw = F.regexp_extract_all(section,
                               F.lit(r"(?im)^[ \t]*allow:[ \t]*"
                                     r"([^#\s]+)"), 1)
    base = df.select(url_host(F.col(url_col)).alias("host"),
                     dis.alias("__d"), alw.alias("__a"))
    out_d = base.select("host", F.lit("disallow").alias("rule"),
                        F.explode("__d").alias("prefix"))
    out_a = base.select("host", F.lit("allow").alias("rule"),
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

    Plan: rules collapse to ONE row per HOST (two collected prefix
    arrays — bounded: real robots files are small) and broadcast-join
    onto the URL table; the match is one ``aggregate`` fold over the
    arrays per URL. No shuffle of the corpus. Host scoping per RFC 9309
    §2.3: a sibling subdomain's rules never apply."""
    per_host = (rules.groupBy("host").agg(
        F.collect_list(F.when(F.col("rule") == "disallow",
                              F.col("prefix"))).alias("__dis"),
        F.collect_list(F.when(F.col("rule") == "allow",
                              F.col("prefix"))).alias("__alw")))
    u = urls.withColumn("__host", url_host(F.col(url_col))) \
            .withColumn("__path", url_path(F.col(url_col)))
    joined = u.join(F.broadcast(per_host),
                    u["__host"] == per_host["host"], "left")

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
