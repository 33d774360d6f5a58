"""URL canonicalization and URL-keyed deduplication.

Web-corpus pipelines dedupe by canonical URL before any content-level
pass (CCNet, RefinedWeb §3.1) — it removes the bulk of crawl re-fetches
for the cost of ONE string projection plus one hash-groupBy, far cheaper
than MinHash. The reference has no URL handling; this module is part of
the training-data surface this engine adds.

Everything here is pure Spark SQL expressions (whole-stage codegen, no
Python in the hot path): the canonical form is built with
regexp_extract / split / filter / array_sort, so a 100 TB URL column
canonicalizes at scan speed and the dedup is a single map-side-combined
shuffle on the canonical key.

Canonical form (conservative, reversible-intent preserving):
- scheme and host lowercased; userinfo (``user:pass@``) dropped
- leading ``www.`` dropped; default ports (``:80`` http, ``:443``
  https) dropped
- path: duplicate slashes collapsed, trailing slash dropped (root
  stays ``/``)
- query: tracking params removed (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``mc_cid``, ``mc_eid``, ``igshid``, ``ref_src``),
  remaining params sorted for order-insensitivity; empty query dropped
- fragment dropped
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# default-removed query parameters: analytics/click tracking only — never
# content-addressing params like id/page/q
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref_src)="


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonicalize_url(url: Union[str, Column],
                     tracking_param_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical form of a URL as a single Column expression.

    Non-URL strings (no ``scheme://``) pass through trimmed — the caller
    decides whether to treat them as junk; NULL stays NULL.
    """
    u = F.trim(_col(url))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")

    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    # drop userinfo, lowercase, drop leading www.
    host_nouser = F.regexp_replace(hostport, r"^[^@]*@", "")
    host_l = F.lower(host_nouser)
    host_nw = F.regexp_replace(host_l, r"^www\.", "")
    host = F.when(scheme == "http",
                  F.regexp_replace(host_nw, r":80$", "")) \
            .when(scheme == "https",
                  F.regexp_replace(host_nw, r":443$", "")) \
            .otherwise(host_nw)

    tail = F.regexp_replace(rest, r"^[^/?#]*", "")       # /path?query#frag
    path_raw = F.regexp_extract(tail, r"^([^?#]*)", 1)
    path_c = F.regexp_replace(path_raw, r"/{2,}", "/")
    path = F.when(F.length(path_c) > 1,
                  F.regexp_replace(path_c, r"/$", "")).otherwise(path_c)

    query_raw = F.regexp_extract(tail, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query_raw, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(tracking_param_re))
    query = F.array_join(F.array_sort(kept), "&")

    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.length(query) > 0, F.concat(F.lit("?"), query))
         .otherwise(F.lit("")))
    return F.when(scheme == "", u).otherwise(canon)


def extract_domain(url: Union[str, Column]) -> Column:
    """Registrable-domain heuristic from a URL or bare host: the last two
    labels, or last three when the second-to-last is a common SLD
    (``co/com/org/net/ac/gov/edu``) under a 2-letter ccTLD — covers
    ``co.uk``-style hierarchies without a suffix list (a full public
    suffix list would be a broadcast join against these labels)."""
    u = F.trim(_col(url))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_replace(
        F.regexp_replace(hostport, r"^[^@]*@", ""), r":\d+$", ""))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sld = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (n >= 3) & (F.length(tld) == 2) & \
        sld.isin("co", "com", "org", "net", "ac", "gov", "edu")
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    return F.when(n <= 1, host).when(take3, last3).otherwise(last2)


def url_deduplicate(df: DataFrame, id_col: str, url_col: str,
                    tracking_param_re: str = TRACKING_PARAM_RE,
                    keep_by: Optional[str] = None,
                    descending: bool = True) -> DataFrame:
    """Keep one row per canonical URL. The winner is the minimum
    ``id_col`` (stable, engine-portable) by default; ``keep_by`` names a
    score column to rank on instead (``descending=True``: best score
    wins, ties break on min id — keep the freshest/longest fetch of a
    re-crawled URL rather than the earliest). Adds ``canonical_url``;
    drops losers.

    Plan: one projection (canonicalize) + one map-side-combined groupBy
    on the canonical key (``min`` over a (null-flag, score, id) struct
    for the keep_by variant — still one combinable aggregate, no
    window, and no arithmetic on the ID so string/date keys work) + one
    join back on (canonical, id). The join keys are exactly the groupBy
    keys so AQE plans it shuffle-reuse; rows with NULL url pass through
    untouched (never collapsed). A ``descending`` rank on a NON-numeric
    score (e.g. a fetch timestamp) cannot be expressed as a combinable
    min/max without negation, so that one case falls back to a
    row_number window — same single shuffle, full rows instead of
    keys."""
    canon = df.withColumn(
        "canonical_url", canonicalize_url(F.col(url_col), tracking_param_re))
    nonnull = canon.where(F.col("canonical_url").isNotNull())
    nulls = canon.where(F.col("canonical_url").isNull())
    if keep_by is None:
        winners = (nonnull.groupBy("canonical_url")
                   .agg(F.min(id_col).alias(id_col)))
    else:
        score = F.col(keep_by)
        dt = dict(df.dtypes).get(keep_by, "")
        numeric = dt in ("tinyint", "smallint", "int", "bigint",
                         "float", "double") or dt.startswith("decimal")
        if descending and not numeric:
            from pyspark.sql import Window
            w = Window.partitionBy("canonical_url").orderBy(
                score.desc_nulls_last(), F.col(id_col).asc())
            kept = (nonnull.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1).drop("__rn"))
            return kept.unionByName(nulls)
        # one combinable aggregate: min(struct(null-flag, ±score, id)).
        # The leading null-flag (0 = real score) keeps NULL scores from
        # ever beating a real one; the trailing id breaks score ties on
        # MIN id for any orderable id type — no negation of the id.
        signed = (-score) if descending else score
        winners = (nonnull.groupBy("canonical_url")
                   .agg(F.min(F.struct(
                       score.isNull().cast("int").alias("__nul"),
                       signed.alias("__s"),
                       F.col(id_col).alias("__id"))).alias("__w"))
                   .select("canonical_url",
                           F.col("__w.__id").alias(id_col)))
    kept = canon.join(winners, ["canonical_url", id_col], "semi")
    return kept.unionByName(nulls)


def url_dedup_stats(df: DataFrame, url_col: str,
                    tracking_param_re: str = TRACKING_PARAM_RE) -> dict:
    """How much would URL dedup save? One pass: total rows, distinct
    canonical URLs, distinct raw URLs — the gap between the last two is
    what canonicalization alone merges."""
    row = df.agg(
        F.count(url_col).alias("n_urls"),
        F.countDistinct(F.col(url_col)).alias("distinct_raw"),
        F.countDistinct(
            canonicalize_url(F.col(url_col), tracking_param_re))
         .alias("distinct_canonical")).collect()[0]
    n = int(row["n_urls"])
    dc = int(row["distinct_canonical"])
    return {"n_urls": n, "distinct_raw": int(row["distinct_raw"]),
            "distinct_canonical": dc,
            "duplicate_fraction": (n - dc) / n if n else 0.0}


#: substrings whose presence in a URL marks it for the blocklist gate —
#: the RefinedWeb-style URL filter's wordlist dimension (their list is
#: thousands of entries; this default covers the structural categories
#: and is a parameter, not a constant)
DEFAULT_URL_BLOCKWORDS = (
    "porn", "xxx", "casino", "viagra", "escort", "gambling",
)


def url_quality_flags(df: DataFrame, url_col: str,
                      blockwords=DEFAULT_URL_BLOCKWORDS,
                      max_len: int = 512, max_depth: int = 10,
                      max_host_digit_ratio: float = 0.4,
                      max_host_hyphens: int = 3) -> DataFrame:
    """URL-SHAPE quality gate — the RefinedWeb/CCNet first-pass filter
    that drops documents on the URL alone, before any content is
    fetched or scored (at crawl scale the cheapest judgment is the one
    that never touches the page). Pure codegen expressions, one
    projection:

    - ``uq_len`` / ``uq_depth`` — total length and path-segment depth
      (machine-generated calendar/faceted-search traps run deep)
    - ``uq_host_digit_ratio`` / ``uq_host_hyphens`` — spam hosts are
      digit-heavy and hyphen-chained (``cheap-pills-4u-24x7``)
    - ``uq_blockword`` — any ``blockwords`` substring in the lowered
      URL (parameterized; production lists are domain policy)
    - ``uq_keep`` — the conjunction of every bound

    Flags, not a filter: callers inspect per-rule failure rates (the
    Gopher-flags convention) and gate on ``uq_keep``."""
    u = F.lower(F.trim(F.col(url_col)))
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://", "")
    host = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(rest, r"^([^/?#]*)", 1),
                         r"^[^@]*@", ""), r":\d+$", "")
    path = F.regexp_extract(rest, r"^[^/?#]*(/[^?#]*)?", 1)
    host_len = F.greatest(F.length(host), F.lit(1))
    digit_ratio = (F.length(F.regexp_replace(host, r"[^0-9]", ""))
                   / host_len).cast("double")
    hyphens = F.length(F.regexp_replace(host, r"[^-]", ""))
    depth = F.when(F.length(path) == 0, F.lit(0)).otherwise(
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")))
    blocked = F.lit(False)
    for w in blockwords:
        blocked = blocked | u.contains(w)
    keep = ((F.length(u) <= max_len) & (depth <= max_depth)
            & (digit_ratio <= max_host_digit_ratio)
            & (hyphens <= max_host_hyphens) & ~blocked
            & (F.length(host) > 0))
    return (df
            .withColumn("uq_len", F.length(u))
            .withColumn("uq_depth", depth)
            .withColumn("uq_host_digit_ratio", digit_ratio)
            .withColumn("uq_host_hyphens", hyphens)
            .withColumn("uq_blockword", blocked)
            .withColumn("uq_keep", keep))
