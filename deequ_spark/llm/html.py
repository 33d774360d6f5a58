"""HTML → text extraction — the stage between a crawl's raw HTTP
responses and every text operator in this package. WET files arrive
pre-extracted; raw WARC ``response`` records do not, and a pipeline
that can only consume WET is only half an ingest path.

Pure JVM-side expressions (regexp_replace chains — no Python in the
plan, fully pushed into whole-stage codegen): comment and
script/style/head removal, block-tag → newline mapping so the Gopher
line-based quality rules still see document structure, tag stripping,
the common named entities, and whitespace normalization. Regex-based
extraction is the documented 95% answer, not an HTML5 parser: CDATA
inside scripts containing literal ``</script>`` in string constants,
conditional comments, and malformed markup degrade gracefully (extra
whitespace, never an exception). A real browser-grade extractor
(trafilatura/jusText) plugs in at ``extract_html_text``'s seam as a
pandas UDF when fidelity matters more than staying JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["html_to_text", "html_documents", "html_content_blocks",
           "html_main_content", "html_content_score"]

# order matters: ``&amp;`` decodes LAST so double-encoded entities
# ("&amp;lt;") correctly yield the literal "&lt;" text
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
             ("&amp;", "&")]

# closing block-level tags (and <br>) become newlines so line-oriented
# quality rules (bullet/ellipsis/dup-line ratios) keep their signal
_BLOCK_RE = (r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|"
             r"/blockquote|/section|/article|/header|/footer|/pre)"
             r"\s*/?\s*>")


def _strip_subtrees(s: Column) -> Column:
    """Comments and ``<script>``/``<style>``/``<head>`` subtrees → one
    space (their content is code, not text)."""
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(
        s, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    s = F.regexp_replace(
        s, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    return F.regexp_replace(
        s, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")


def _decode_entities(s: Column) -> Column:
    for ent, rep in _ENTITIES:
        s = F.regexp_replace(s, ent, rep)
    return s


def _normalize_line_ws(s: Column) -> Column:
    """Whitespace runs containing a newline become ONE newline; other
    runs one space; edges trimmed (regex — trim() strips only spaces)."""
    s = F.regexp_replace(s, r"[ \t\x0b\f\r]*\n[\s]*", "\n")
    s = F.regexp_replace(s, r"[ \t\x0b\f\r]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def html_to_text(html: Column, preserve_lines: bool = True) -> Column:
    """Visible text of an HTML string as a single Column expression.

    Pipeline: strip comments → drop ``<script>``/``<style>``/``<head>``
    subtrees → map closing block tags and ``<br>`` to newlines
    (``preserve_lines``) → strip remaining tags → decode the common
    named entities → collapse whitespace (runs containing a newline
    become ONE newline; other runs one space) → trim. NULL in → NULL
    out."""
    s = _strip_subtrees(html)
    if preserve_lines:
        s = F.regexp_replace(s, _BLOCK_RE, "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    s = _decode_entities(s)
    if preserve_lines:
        return _normalize_line_ws(s)
    s = F.regexp_replace(s, r"\s+", " ")
    return F.regexp_replace(s, r"^\s+|\s+$", "")


# sentinel chars marking anchor-text spans through the tag strip; any
# pre-existing occurrence in the input is removed first, so they can
# only mean "<a>...</a>" afterwards
_A_OPEN, _A_CLOSE = "\x01", "\x02"


def html_content_blocks(html: Column) -> Column:
    """Per-LINE content features of an HTML string:
    ``array<struct<line, n_chars, anchor_chars, link_density>>``.

    The boilerpipe/Arc90/jusText family separates main content from
    nav bars, footers and cookie banners by BLOCK-LEVEL text-vs-link
    density — boilerplate blocks are short and link-saturated, body
    prose is long and link-sparse. This is the JVM-side, pure-
    expression version: ``<a>`` open/close tags are rewritten to
    sentinel chars BEFORE the tag strip, so after extraction each
    line knows how many of its characters sat inside anchors. An
    anchor left unclosed on its line counts to the line end (the
    conservative reading); an anchor spanning a block boundary counts
    only its first line's span.

    Built on the same strip/decode/normalize chain as
    :func:`html_to_text` — whole-stage codegen, no Python."""
    s = F.regexp_replace(html, f"[{_A_OPEN}{_A_CLOSE}]", "")
    s = _strip_subtrees(s)
    s = F.regexp_replace(s, _BLOCK_RE, "\n")
    # space OUTSIDE each sentinel: html_to_text turns every tag into a
    # space, and without it 'foo<a>bar</a>baz' would fuse to
    # 'foobarbaz' here (the normalizer collapses the extra spaces; the
    # anchor span between the sentinels is unaffected)
    s = F.regexp_replace(s, r"(?is)<a\b[^>]*>", " " + _A_OPEN)
    s = F.regexp_replace(s, r"(?is)</a\s*>", _A_CLOSE + " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    s = _decode_entities(s)
    s = _normalize_line_ws(s)

    def line_struct(ln: Column) -> Column:
        pieces = F.split(ln, _A_OPEN)
        anchor = F.aggregate(
            F.slice(pieces, 2, F.greatest(F.size(pieces) - 1, F.lit(0))),
            F.lit(0),
            lambda acc, p: acc + F.length(
                F.substring_index(p, _A_CLOSE, 1)))
        clean = F.regexp_replace(ln, f"[{_A_OPEN}{_A_CLOSE}]", "")
        n = F.length(clean)
        dens = F.when(n > 0, anchor.cast("double") / n) \
            .otherwise(F.lit(0.0))
        return F.struct(clean.alias("line"), n.alias("n_chars"),
                        anchor.alias("anchor_chars"),
                        dens.alias("link_density"))

    return F.transform(F.split(s, "\n"), line_struct)


def _is_content(b: Column, min_chars: int,
                max_link_density: float) -> Column:
    return (b["n_chars"] >= F.lit(int(min_chars))) & \
        (b["link_density"] <= F.lit(float(max_link_density)))


def html_main_content(html: Column, min_chars: int = 30,
                      max_link_density: float = 0.30) -> Column:
    """Main-content text: the lines of :func:`html_content_blocks`
    that pass the content rule (≥ ``min_chars`` visible characters AND
    ≤ ``max_link_density`` fraction of them inside anchors), joined
    with newlines. Nav bars, footers, cookie banners and pagination
    rows are short and link-dense, so they fall; body prose survives.
    NULL in → NULL out; a page with no qualifying line yields ''."""
    kept = F.filter(html_content_blocks(html),
                    lambda b: _is_content(b, min_chars, max_link_density))
    return F.array_join(F.transform(kept, lambda b: b["line"]), "\n")


def _content_struct(html: Column, min_chars: int,
                    max_link_density: float) -> Column:
    """``struct(text, content_score)`` in ONE aggregate over ONE block
    array — the fused form :func:`html_documents` uses so the
    expensive strip/decode/per-line chain runs once per page, not once
    per output column (HOF expressions are CodegenFallback and get no
    common-subexpression elimination)."""
    def kept(a, b):
        return _is_content(b, min_chars, max_link_density)

    return F.aggregate(
        html_content_blocks(html),
        F.struct(F.lit("").alias("txt"), F.lit(0).alias("n"),
                 F.lit(0).alias("kept"), F.lit(0).alias("tot")),
        lambda a, b: F.struct(
            F.when(kept(a, b),
                   F.when(a["n"] == 0, b["line"])
                    .otherwise(F.concat(a["txt"], F.lit("\n"),
                                        b["line"])))
             .otherwise(a["txt"]).alias("txt"),
            (a["n"] + F.when(kept(a, b), F.lit(1)).otherwise(F.lit(0)))
            .alias("n"),
            (a["kept"] + F.when(kept(a, b), b["n_chars"])
             .otherwise(F.lit(0))).alias("kept"),
            (a["tot"] + b["n_chars"]).alias("tot")),
        lambda a: F.struct(
            a["txt"].alias("text"),
            F.when(a["tot"] > 0, a["kept"].cast("double") / a["tot"])
             .alias("content_score")))


def html_content_score(html: Column, min_chars: int = 30,
                       max_link_density: float = 0.30) -> Column:
    """Fraction of the page's visible characters that live in content
    lines (the :func:`html_main_content` keep-set) — a cheap page-level
    boilerplate gauge: ~0 for link farms / pure chrome, → 1 for
    article-shaped pages. ONE aggregate over the block array (the
    expensive block expression appears exactly once in the plan).
    NULL for NULL input or a page with no visible text at all."""
    return F.aggregate(
        html_content_blocks(html),
        F.struct(F.lit(0).alias("kept"), F.lit(0).alias("tot")),
        lambda a, b: F.struct(
            (a["kept"] + F.when(
                _is_content(b, min_chars, max_link_density),
                b["n_chars"]).otherwise(F.lit(0))).alias("kept"),
            (a["tot"] + b["n_chars"]).alias("tot")),
        lambda a: F.when(a["tot"] > 0,
                         a["kept"].cast("double") / a["tot"]))


def html_documents(responses: DataFrame,
                   preserve_lines: bool = True,
                   main_content: bool = False,
                   min_chars: int = 30,
                   max_link_density: float = 0.30) -> DataFrame:
    """``(url, text)`` from a :func:`~deequ_spark.llm.warc.
    http_responses` frame: keep ``text/html`` (and missing-type)
    responses with a 2xx status, decode the body as UTF-8 with latin-1
    fallback semantics (Spark's binary→string cast replaces invalid
    sequences), and extract visible text. Map-only — composes with
    ``read_warc`` into a raw-HTML ingest path parallel to the WET one.

    ``main_content=True`` swaps the extractor for
    :func:`html_main_content` (link-density block scoring — nav/
    footer/banner chrome dropped) and adds a ``content_score`` column
    (fraction of visible chars kept) for downstream thresholding."""
    ok_type = (F.col("http_content_type").isNull()
               | F.lower(F.col("http_content_type"))
               .startswith("text/html"))
    ok_status = F.col("status").isNotNull() & \
        (F.col("status") >= 200) & (F.col("status") < 300)
    body = F.col("body").cast("string")
    if main_content:
        # explode(array(struct)) is a PROJECTION BARRIER: the struct is
        # computed once in the Generate node and text/content_score are
        # field references on its output. Selecting two fields of the
        # struct expression directly would let CollapseProject inline
        # the whole blocks pipeline once per field (the known k-sibling
        # recompute trap).
        c = _content_struct(body, min_chars, max_link_density)
        out = (responses.where(ok_type & ok_status)
               .select("url", F.explode(F.array(c)).alias("__c"))
               .select("url", F.col("__c.text").alias("text"),
                       F.col("__c.content_score").alias("content_score")))
    else:
        out = (responses.where(ok_type & ok_status)
               .select("url",
                       html_to_text(body, preserve_lines=preserve_lines)
                       .alias("text")))
    return out.where(F.length("text") > 0)


# attribute order varies in the wild: name-then-content AND content-
# then-name forms both occur; both are matched and coalesced.
# Boundaries matter: the attribute VALUE must terminate right after the
# name (quote/space/slash/tag-end) or name="robots-override" would
# match name=robots; the content capture is keyed to its OPENING quote
# (backreference) or content="It's fine" would truncate at the
# apostrophe.  Java-regex-only features (backrefs, lookahead) are fine
# here — these patterns never run in the SQL oracle.
_NAME_BOUND = """["'\\s/>]"""
_QUOTED_VAL = r"""(["'])((?:(?!\1).)*)\1"""
_META_NC_RE = (r"""(?is)<meta\b[^>]*?name\s*=\s*["']?{name}"""
               + _NAME_BOUND + r"""[^>]*?content\s*=\s*""" + _QUOTED_VAL)
_META_CN_RE = (r"""(?is)<meta\b[^>]*?content\s*=\s*""" + _QUOTED_VAL
               + r"""[^>]*?name\s*=\s*["']?{name}""" + _NAME_BOUND)
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_CANON_HL_RE = (r"""(?is)<link\b[^>]*?rel\s*=\s*["']?canonical"""
                + _NAME_BOUND
                + r"""[^>]*?href\s*=\s*["']?([^"'\s>]+)""")
_CANON_LH_RE = (r"""(?is)<link\b[^>]*?href\s*=\s*["']?([^"'\s>]+)["']?"""
                r"""[^>]*?rel\s*=\s*["']?canonical""" + _NAME_BOUND)


def _meta_content(html: Column, name: str) -> Column:
    nc = F.regexp_extract(html, _META_NC_RE.format(name=name), 2)
    cn = F.regexp_extract(html, _META_CN_RE.format(name=name), 2)
    got = F.when(nc != "", nc).otherwise(cn)
    return F.when(got != "", got)


def html_metadata(html) -> Column:
    """Head metadata of an HTML page as ONE struct column:
    ``title``, ``meta_description``, ``canonical_url``, ``noindex``,
    ``nofollow`` — the fields a crawl pipeline consumes before (or
    instead of) the body:

    - ``canonical_url`` (``<link rel=canonical>``) is the page's OWN
      statement of its canonical address — feed it to
      ``urls.url_deduplicate`` and syndicated copies collapse onto the
      original even when their fetch URLs differ.
    - ``noindex`` / ``nofollow`` (``<meta name=robots>``) are the
      in-page half of robots control (RFC 9309 covers only the
      crawl-time half); noindex pages are disproportionately
      boilerplate, pagination, and faceted-search chaff — a cheap
      pre-filter signal.
    - ``title`` / ``meta_description`` are short human summaries —
      classifier features and dedup keys far cheaper than the body.

    All regexp extraction + entity decode, whole-stage codegen;
    attribute order variants (name-before-content and the reverse)
    both match.  Absent fields are NULL.
    """
    h = html if isinstance(html, Column) else F.col(html)
    title_raw = F.regexp_extract(h, _TITLE_RE, 1)
    # titles are single-line: collapse ALL whitespace (newlines too)
    title = F.trim(F.regexp_replace(_decode_entities(
        F.regexp_replace(title_raw, r"<[^>]*>", " ")), r"\s+", " "))
    title = F.when(F.length(title) > 0, title)
    canon_hl = F.regexp_extract(h, _CANON_HL_RE, 1)
    canon_lh = F.regexp_extract(h, _CANON_LH_RE, 1)
    canon = F.when(canon_hl != "", canon_hl) \
             .when(canon_lh != "", canon_lh)
    robots = F.lower(F.coalesce(_meta_content(h, "robots"), F.lit("")))
    desc = _meta_content(h, "description")
    return F.struct(
        title.alias("title"),
        F.when(desc.isNotNull(),
               F.trim(F.regexp_replace(_decode_entities(desc),
                                       r"\s+", " ")))
        .alias("meta_description"),
        canon.alias("canonical_url"),
        robots.rlike(r"\bnoindex\b").alias("noindex"),
        robots.rlike(r"\bnofollow\b").alias("nofollow"))
