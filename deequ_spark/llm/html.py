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

__all__ = ["html_to_text", "html_documents"]

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


def html_to_text(html: Column, preserve_lines: bool = True) -> Column:
    """Visible text of an HTML string as a single Column expression.

    Pipeline: strip comments → drop ``<script>``/``<style>``/``<head>``
    subtrees (their content is code, not text) → map closing block tags
    and ``<br>`` to newlines (``preserve_lines``) → strip remaining
    tags → decode the common named entities → collapse whitespace
    (runs containing a newline become ONE newline; other runs one
    space) → trim. NULL in → NULL out."""
    s = html
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(
        s, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    s = F.regexp_replace(
        s, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    s = F.regexp_replace(
        s, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    if preserve_lines:
        s = F.regexp_replace(s, _BLOCK_RE, "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        s = F.regexp_replace(s, ent, rep)
    if preserve_lines:
        # a whitespace run containing a newline is one line break;
        # anything else is one space
        s = F.regexp_replace(s, r"[ \t\x0b\f\r]*\n[\s]*", "\n")
        s = F.regexp_replace(s, r"[ \t\x0b\f\r]+", " ")
        s = F.regexp_replace(s, r" ?\n ?", "\n")
    else:
        s = F.regexp_replace(s, r"\s+", " ")
    # trim() strips only spaces — newlines at the edges need the regex
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def html_documents(responses: DataFrame,
                   preserve_lines: bool = True) -> DataFrame:
    """``(url, text)`` from a :func:`~deequ_spark.llm.warc.
    http_responses` frame: keep ``text/html`` (and missing-type)
    responses with a 2xx status, decode the body as UTF-8 with latin-1
    fallback semantics (Spark's binary→string cast replaces invalid
    sequences), and extract visible text. Map-only — composes with
    ``read_warc`` into a raw-HTML ingest path parallel to the WET one."""
    ok_type = (F.col("http_content_type").isNull()
               | F.lower(F.col("http_content_type"))
               .startswith("text/html"))
    ok_status = F.col("status").isNotNull() & \
        (F.col("status") >= 200) & (F.col("status") < 300)
    return (responses.where(ok_type & ok_status)
            .select("url",
                    html_to_text(F.col("body").cast("string"),
                                 preserve_lines=preserve_lines)
                    .alias("text"))
            .where(F.length("text") > 0))
