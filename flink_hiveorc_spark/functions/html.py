"""HTML text extraction — the canonical step between the WARC/ARC
envelope (functions/archive.py) and every text operator: Common Crawl
response blocks are HTML, and an LLM curation pipeline's first move is
tags → text (the trafilatura/jusText class, reduced to its portable
core).

Everything here is a COLUMN function (chained regexp_replace /
regexp_extract — JVM-side, whole-stage-codegen, zero Python in the hot
path), so extraction composes with any frame at scan throughput. The
extraction contract, in order (order matters — blocks strip before
tags so `var x = 1 < 2;` never leaks):

1. comments `<!-- ... -->` drop (dotall — comments span lines);
2. `<script>`/`<style>` ELEMENTS drop with their content (per the
   HTML5 raw-text rule the element ends at the first closing tag,
   so a `</script>` inside a JS string ends the block — same
   behavior as a spec parser);
3. remaining tags `<...>` become spaces (attribute values containing
   a literal `>` over-trim one token — the documented regex-parser
   tradeoff every production tag-stripper of this class shares);
4. the HTML4 core named entities decode (&lt; &gt; &quot; &#39;
   &apos; &nbsp;, with &amp; LAST so `&amp;lt;` yields `&lt;` not
   `<` — the standard double-decode guard); other entities pass
   through verbatim;
5. whitespace collapses to single spaces, trimmed.

Reference repo has no text surface (SURVEY.md §0); need comes from the
archive envelope landing in r13 (the WARC block column is HTML).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

# (pattern, replacement) chain; Spark regexp_replace is global, Java
# dialect. The same patterns run under RE2 (DuckDB) — no backreferences
# by design (RE2 has none), which is why script/style are two rules.
_STRIP_RULES = (
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"<[^>]*>", " "),
)

# Decode order matters: &amp; last (double-decode guard).
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(col) -> Column:
    """HTML column → extracted plain text (see the module contract)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in _STRIP_RULES:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_title(col) -> Column:
    """The <title> element's text ('' when absent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title>", 1))


def html_links(col) -> Column:
    """Array of href targets from <a> elements (double- or
    single-quoted attributes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        c, F.lit(r"""(?is)<a\s[^>]*href=["']([^"']*)["']"""), F.lit(1)
    )


def html_stats(html_df: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, <html_col>) → extraction features: title, body_text,
    n_links, text_chars. Pure column expressions — map-only, codegen,
    composes directly with web_archive_records' block column (cast
    binary → string upstream)."""
    body = html_to_text(html_col)
    return html_df.select(
        "doc_id",
        html_title(html_col).alias("title"),
        body.alias("body_text"),
        F.size(html_links(html_col)).cast("long").alias("n_links"),
        F.length(body).cast("long").alias("text_chars"),
    )


@query(
    "text_html_extract",
    oracle="""
    SELECT doc_id,
           'Doc ' || doc_id AS title,
           'Doc ' || doc_id || ' ' || source || ' & friends ' || text
             || ' first second' AS body_text,
           CAST(2 AS BIGINT) AS n_links,
           CAST(length('Doc ' || doc_id || ' ' || source || ' & friends '
                       || text || ' first second') AS BIGINT) AS text_chars
    FROM documents
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML extraction under a GROUND-TRUTH oracle: each doc is
    wrapped into a full synthetic page — doctype, <title>, a <style>
    block, a <script> block whose body contains a bare `<`, an HTML
    comment containing tags, an entity (&amp;), heading/paragraph
    text from the real columns, and two links — and the expected
    extraction is recomputed in DuckDB by plain string concatenation
    of the RAW columns (no HTML logic oracle-side at all): the
    extractor must delete exactly the style/script/comment content,
    strip exactly the tags, and decode exactly the entity, or the
    value hash dies. documents.text is verified <>&-free at all SFs,
    so the ground truth is exact. Scale: one projection, zero
    exchanges, zero Python."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<!DOCTYPE html>\n<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title>\n<style>body { color: #000; }</style>\n"
            '<script type="text/javascript">var x = 1 < 2;</script>\n'
            "</head>\n<body>\n<!-- comment <b>with tags</b> -->\n"
            '<h1 class="hd">'
        ),
        F.col("source"),
        F.lit(" &amp; friends</h1>\n<p>"),
        F.col("text"),
        F.lit('</p>\n<a href="https://example.com/'),
        F.col("doc_id").cast("string"),
        F.lit('">first</a>\n<a href=\'/rel\'>second</a>\n</body></html>'),
    )
    return html_stats(d.select("doc_id", html.alias("html")))


@query(
    "pipeline_crawl_extract",
    oracle="""
    SELECT doc_id,
           'warc' AS fmt,
           'response' AS rec_type,
           CASE doc_id % 3 WHEN 0 THEN 200 ELSE NULL END AS http_status,
           CASE doc_id % 3 WHEN 1 THEN 'windows-1252'
                ELSE 'utf-8' END AS charset,
           CASE doc_id % 3 WHEN 2 THEN 'meta'
                ELSE 'header' END AS charset_source,
           'Doc ' || doc_id AS title,
           'Doc ' || doc_id || ' '
             || CASE doc_id % 3
                  WHEN 0 THEN 'café crawl '
                  WHEN 1 THEN 'résumé naïve ' ELSE '' END
             || source || ' & friends ' || text
             || ' first second' AS body_text,
           CAST(2 AS BIGINT) AS n_links,
           'https://example.com/' || doc_id AS first_url_norm
    FROM documents
    """,
)
def pipeline_crawl_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END crawl pipeline under one ground-truth oracle:
    each doc's synthetic HTML page (the text_html_extract
    construction) is FRAMED AS A WARC RESPONSE RECORD Spark-side
    (Content-Length = octet_length of the block bytes, computed in
    the same projection — the framing is data-dependent, so a wrong
    byte count anywhere kills the split), in one of THREE charset
    shapes (doc_id % 3): a raw application/http response envelope
    (the real Common Crawl block shape — status line + HTTP headers
    peeled by split_http_response, charset=utf-8 from the INNER
    Content-Type, a 'café' literal in the body), a bare block whose
    record header says charset=iso-8859-1 over cp1252-meaning bytes
    (the WHATWG alias rule — JVM-encoded ISO-8859-1 'résumé naïve'),
    and an unlabeled block whose <meta charset="utf-8"> prescan must
    fire. The records flow through the REAL chain:
    web_archive_text_records (record split → HTTP peel → charset
    sniff → transcode) → html extraction (tags/script/comment
    elision, entity decode) → link capture → URL normalization of
    the first link. DuckDB recomputes every expected output by plain
    string concat of the raw columns — no WARC, HTTP, charset, HTML,
    or URL logic oracle-side. Scale: map-only end to end (fan-out +
    projections), zero exchanges, Python only in the record
    splitter/decoder."""
    from flink_hiveorc_spark.functions.charset import (
        web_archive_text_records,
    )
    from flink_hiveorc_spark.functions.urls import url_normalize

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3

    def page(prefix: str, head_extra: str = "") -> Column:
        return F.concat(
            F.lit("<!DOCTYPE html>\n<html><head><title>Doc "),
            did,
            F.lit(
                "</title>\n" + head_extra
                + "<style>body { color: #000; }</style>\n"
                '<script type="text/javascript">var x = 1 < 2;</script>\n'
                "</head>\n<body>\n<!-- comment <b>with tags</b> -->\n"
                '<h1 class="hd">' + prefix
            ),
            F.col("source"),
            F.lit(" &amp; friends</h1>\n<p>"),
            F.col("text"),
            F.lit('</p>\n<a href="https://example.com/'),
            did,
            F.lit('">first</a>\n<a href=\'/rel\'>second</a>\n</body></html>'),
        )

    # m=0: the real Common Crawl shape — the block is a raw HTTP
    # response; charset comes from the INNER Content-Type header
    page0 = page("café crawl ")
    block0 = F.encode(
        F.concat(
            F.lit(
                "HTTP/1.1 200 OK\r\n"
                "Content-Type: text/html; charset=utf-8\r\n"
                "Content-Length: "
            ),
            F.octet_length(page0).cast("string"),
            F.lit("\r\n\r\n"),
            page0,
        ),
        "utf-8",
    )
    # m=1: bare block, iso-8859-1 transport label over latin bytes —
    # decoded through the WHATWG windows-1252 alias
    block1 = F.encode(page("résumé naïve "), "ISO-8859-1")
    # m=2: bare block, no label — the <meta charset> prescan decides
    block2 = F.encode(page("", '<meta charset="utf-8">\n'), "utf-8")
    block = F.when(m == 0, block0).when(m == 1, block1).otherwise(block2)
    ctype = (
        F.when(m == 0, F.lit("application/http; msgtype=response"))
        .when(m == 1, F.lit("text/html; charset=iso-8859-1"))
        .otherwise(F.lit("text/html"))
    )
    hdr = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Record-ID: <urn:uuid:0d9c2a7e-6d4f-4b5e-9a1c-"
            "0000000000cc>\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            "WARC-Target-URI: https://example.com/"
        ),
        did,
        F.lit("\r\nContent-Type: "),
        ctype,
        F.lit("\r\nContent-Length: "),
        F.octet_length(block).cast("string"),
        F.lit("\r\n\r\n"),
    )
    warc = F.concat(F.encode(hdr, "utf-8"), block, F.encode(F.lit("\r\n\r\n"), "utf-8"))
    recs = web_archive_text_records(
        d.select("doc_id", warc.alias("payload"))
    )
    html = F.col("text")
    return recs.select(
        "doc_id",
        "fmt",
        "rec_type",
        "http_status",
        "charset",
        "charset_source",
        html_title(html).alias("title"),
        html_to_text(html).alias("body_text"),
        F.size(html_links(html)).cast("long").alias("n_links"),
        url_normalize(F.element_at(html_links(html), 1)).alias(
            "first_url_norm"
        ),
    )


# ------------------------------------------------------- Markdown

# Strip order matters: fenced code blocks first (their content is
# LITERAL — a '# comment' inside a fence is not a heading), then
# inline code, images before links (the image syntax embeds the link
# syntax), then the marker classes. Java-regex only: the underscore
# italics rule uses lookbehind/lookahead, which RE2 does NOT support —
# a DuckDB-side oracle must never reuse these patterns (the shipped
# oracles recompute expected text by plain string concat instead).
_MD_RULES = (
    (r"(?s)```.*?```", " "),        # fenced code blocks drop whole
    (r"`([^`\n]*)`", r"$1"),         # inline code keeps its text
    (r"!\[([^\]]*)\]\([^)]*\)", r"$1"),  # image -> alt text
    (r"\[([^\]]*)\]\([^)]*\)", r"$1"),   # link -> anchor text
    (r"(?m)^#{1,6}\s+", ""),         # ATX heading markers
    (r"(?m)^\s{0,3}(?:[-*+]|\d+\.)\s+", ""),  # list bullets
    (r"(?m)^\s{0,3}>\s?", ""),       # blockquote markers
    (r"(?m)^(?:-{3,}|\*{3,}|_{3,})\s*$", " "),  # thematic breaks
    (r"\*\*([^*]*)\*\*", r"$1"),     # bold
    (r"__([^_]*)__", r"$1"),
    (r"\*([^*\n]*)\*", r"$1"),       # italics
    (r"(?<![A-Za-z0-9_])_([^_\n]*)_(?![A-Za-z0-9_])", r"$1"),
)


def markdown_to_text(col) -> Column:
    """Markdown column → plain text (GitHub-corpus README/doc class):
    fenced code dropped, inline code/links/images keep their text,
    heading/list/quote/emphasis markers stripped, whitespace
    collapsed. Pure JVM regexp chain — zero Python."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in _MD_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


@query(
    "text_markdown_extract",
    oracle="""
    SELECT doc_id,
           'Title ' || doc_id || ' intro ' || source || ' bold-' || lang
             || ' item one item ' || doc_id || ' quoted line anchor-'
             || doc_id || ' alt-' || doc_id || ' ' || text
             || ' tail code' AS md_text,
           CAST(2 AS BIGINT) AS n_headings,
           CAST(1 AS BIGINT) AS n_code_fences
    FROM documents
    """,
)
def text_markdown_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown extraction under a GROUND-TRUTH oracle: each doc
    becomes a synthetic README exercising every rule — two headings,
    emphasis, a list, a blockquote, a link and an image (both must
    keep only their text), a fenced block whose CONTENT contains a
    fake heading (must vanish whole), inline code (text kept), a
    thematic break — and DuckDB recomputes the expected text by plain
    concat of raw columns, no Markdown logic oracle-side. Headings count on the
    fence-stripped source (an in-fence '# ...' is literal text, not
    a heading); fences count as whole blocks.
    Scale: one projection, zero exchanges, zero Python."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    md = F.concat(
        F.lit("# Title "), did,
        F.lit("\n\nintro "), F.col("source"),
        F.lit(" **bold-"), F.col("lang"), F.lit("**\n\n"),
        F.lit("- item one\n- item "), did, F.lit("\n\n> quoted line\n\n"),
        F.lit("[anchor-"), did, F.lit("](https://x.test/"), did,
        F.lit(")\n\n![alt-"), did, F.lit("](img.png)\n\n"),
        F.lit("```\n# not a heading\ncode body\n```\n\n## "),
        F.col("text"),
        F.lit("\n\n---\n\ntail `code`\n"),
    )
    body = markdown_to_text(F.col("md"))
    return d.select("doc_id", md.alias("md")).select(
        "doc_id",
        body.alias("md_text"),
        F.regexp_count(
            F.regexp_replace(F.col("md"), r"(?s)```.*?```", " "),
            F.lit(r"(?m)^#{1,6}\s"),
        ).cast("long").alias("n_headings"),
        F.regexp_count(F.col("md"), F.lit(r"(?s)```.*?```")).cast(
            "long"
        ).alias("n_code_fences"),
    )


# ------------------------------------ crawl meta-directives (r15)


def html_canonical(col) -> Column:
    """The rel=canonical link target ('' when absent) — the page's
    self-declared canonical URL, the strongest crawl-dedup signal
    after content hashing. Attribute ORDER is free in real markup
    (rel before or after href), so the tag is located first and the
    href extracted from the captured tag ('' when the tag lacks
    one)."""
    c = F.col(col) if isinstance(col, str) else col
    tag = F.regexp_extract(
        c, r"""(?is)(<link\s[^>]*rel\s*=\s*["']?canonical["'\s>][^>]*>)""", 1
    )
    # the tag regex above requires a terminator after 'canonical';
    # re-extract handles rel="canonical" as the LAST attribute too
    tag2 = F.when(tag != "", tag).otherwise(
        F.regexp_extract(
            c, r"""(?is)(<link\s[^>]*rel\s*=\s*["']?canonical["']?\s*/?>)""", 1
        )
    )
    return F.regexp_extract(
        tag2, r"""(?is)href\s*=\s*["']([^"']*)["']""", 1
    )


def html_opengraph(col, prop: str) -> Column:
    """The content of ``<meta property="og:<prop>" content=...>``
    ('' when absent) — the social-card metadata block most modern
    pages carry, a cheap title/description/image signal for curation
    when the page's own <title> is boilerplate. Attribute order is
    free (property before or after content)."""
    c = F.col(col) if isinstance(col, str) else col
    tag = F.regexp_extract(
        c,
        r"""(?is)(<meta\s[^>]*property\s*=\s*["']?og:"""
        + re.escape(prop)
        + r"""["'\s][^>]*>)""",
        1,
    )
    tag2 = F.when(tag != "", tag).otherwise(
        F.regexp_extract(
            c,
            r"""(?is)(<meta\s[^>]*property\s*=\s*["']?og:"""
            + re.escape(prop)
            + r"""["']?\s*/?>)""",
            1,
        )
    )
    return F.regexp_extract(
        tag2, r"""(?is)content\s*=\s*["']([^"']*)["']""", 1
    )


def html_meta_robots(col) -> Column:
    """struct<noindex: boolean, nofollow: boolean> from the
    <meta name=robots> directive (the page-level opt-out a curation
    pipeline MUST honor before training on crawled text). Token
    match is case-insensitive on the comma-separated content list;
    'none' means both (the spec's shorthand); a missing tag means
    indexable."""
    c = F.col(col) if isinstance(col, str) else col
    tag = F.regexp_extract(
        c, r"""(?is)(<meta\s[^>]*name\s*=\s*["']?robots["']?[^>]*>)""", 1
    )
    content = F.lower(
        F.regexp_extract(
            tag, r"""(?is)content\s*=\s*["']([^"']*)["']""", 1
        )
    )
    toks = F.transform(F.split(content, ","), lambda t: F.trim(t))
    has = lambda word: F.array_contains(toks, word)  # noqa: E731
    none = has("none")
    return F.struct(
        (none | has("noindex")).alias("noindex"),
        (none | has("nofollow")).alias("nofollow"),
    )


@query(
    "text_html_meta_directives",
    oracle="""
    WITH base AS (
      SELECT doc_id, doc_id % 7 AS h, doc_id % 4 AS m FROM documents
    )
    SELECT doc_id,
           CASE WHEN m IN (0, 1)
                THEN 'https://canon-' || h || '.test/c/' || doc_id
                ELSE '' END AS canonical,
           CASE WHEN m IN (1, 2) THEN TRUE ELSE FALSE END AS noindex,
           CASE WHEN m IN (1, 2) THEN TRUE ELSE FALSE END AS nofollow,
           CASE WHEN m = 0 THEN 'OG Doc ' || doc_id
                ELSE '' END AS og_title,
           CASE WHEN m = 1
                THEN 'https://img-' || h || '.test/i/' || doc_id || '.jpg'
                ELSE '' END AS og_image
    FROM base
    """,
)
def text_html_meta_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl meta-directives under a GROUND-TRUTH oracle, doc_id % 4:
    0 = a canonical link with href BEFORE rel (attribute order must
    not matter) + a property-first og:title; 1 = rel-first canonical
    + a 'NoIndex, nofollow' meta (case + whitespace variance) + a
    CONTENT-first og:image; 2 = no canonical, content='none' (the
    both-bits shorthand); 3 = a DECOY <meta name="viewport"> and a
    non-canonical <link rel="stylesheet" href=...> that must extract
    NOTHING. The canonical href and og:image are data-dependent;
    DuckDB recomputes by concat/CASE. Scale: pure projections,
    map-only."""
    from flink_hiveorc_spark.functions.urls import url_normalize

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 7).cast("string")
    m = F.col("doc_id") % 4
    canon = F.concat(
        F.lit("HTTPS://Canon-"), h, F.lit(".test:443/c/"), did,
        F.lit("#frag"),
    )
    html = F.when(
        m == 0,
        F.concat(
            F.lit('<html><head><link href="'), canon,
            F.lit('" rel="canonical"><meta property="og:title" '
                  'content="OG Doc '), did,
            F.lit('"><title>t</title></head>'
                  "<body>x</body></html>"),
        ),
    ).when(
        m == 1,
        F.concat(
            F.lit('<html><head><link rel=canonical href="'), canon,
            F.lit('"><meta name="ROBOTS" content=" NoIndex , nofollow ">'
                  '<meta content="https://img-'), h,
            F.lit(".test/i/"), did,
            F.lit('.jpg" property="og:image"></head>'
                  "<body>x</body></html>"),
        ),
    ).when(
        m == 2,
        F.lit(
            '<html><head><meta name=robots content="none"></head>'
            "<body>x</body></html>"
        ),
    ).otherwise(
        F.lit(
            '<html><head><meta name="viewport" content="width=1">'
            '<link rel="stylesheet" href="/style.css"></head>'
            "<body>x</body></html>"
        )
    )
    mr = html_meta_robots(html)
    raw_canon = html_canonical(html)
    return d.select(
        "doc_id",
        F.when(raw_canon == "", F.lit("")).otherwise(
            url_normalize(raw_canon)
        ).alias("canonical"),
        mr["noindex"].alias("noindex"),
        mr["nofollow"].alias("nofollow"),
        html_opengraph(html, "title").alias("og_title"),
        html_opengraph(html, "image").alias("og_image"),
    )


# --------------------------------------- schema.org JSON-LD (r15)

_JSONLD_SCHEMA = (
    "`@type` STRING, headline STRING, datePublished STRING, "
    "author STRUCT<name: STRING>"
)


def html_jsonld_block(col) -> Column:
    """The first ``<script type="application/ld+json">`` block's raw
    JSON text ('' when absent) — schema.org structured data, the
    richest machine-readable article metadata real pages carry."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_extract(
            c,
            r"""(?is)<script[^>]*type\s*=\s*["']application/ld\+json["']"""
            r"""[^>]*>(.*?)</script>""",
            1,
        )
    )


def html_jsonld_article(col) -> Column:
    """struct<@type, headline, datePublished, author.name> parsed
    JVM-side by from_json from the page's JSON-LD block (nulls when
    absent/malformed — crawl noise must not error)."""
    return F.from_json(html_jsonld_block(col), _JSONLD_SCHEMA)


@query(
    "text_html_jsonld",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, doc_id % 9 + 1 AS k, doc_id % 3 AS m
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN m = 2 THEN NULL ELSE 'NewsArticle' END AS ld_type,
           CASE WHEN m = 2 THEN NULL
                ELSE 'Doc ' || doc_id || ' headline' END AS headline,
           CASE WHEN m = 2 THEN NULL ELSE source END AS author,
           CASE WHEN m = 2 THEN CAST(NULL AS TIMESTAMP)
                ELSE CAST('2024-04-0' || k || 'T06:30:00Z' AS TIMESTAMP)
                END AS published_ts
    FROM base
    """,
)
def text_html_jsonld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD extraction under a GROUND-TRUTH oracle,
    doc_id % 3: legs 0/1 carry an application/ld+json script (leg 1
    with a DECOY plain-JS <script> before it that must not match),
    leg 2 has no JSON-LD (all-NULL row — crawl noise must not
    error). The block parses JVM-side via from_json (@type needs
    the backtick-quoted field), datePublished types to UTC. DuckDB
    recomputes by concat/CASE. Scale: pure projections, map-only,
    zero Python."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    k = (F.col("doc_id") % 9 + 1).cast("string")
    m = F.col("doc_id") % 3
    ld = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"NewsArticle",'
              '"headline":"Doc '),
        did,
        F.lit(' headline","datePublished":"2024-04-0'), k,
        F.lit('T06:30:00Z","author":{"@type":"Person","name":"'),
        F.col("source"),
        F.lit('"}}'),
    )
    html = F.when(
        m == 0,
        F.concat(
            F.lit('<html><head><script type="application/ld+json">'),
            ld,
            F.lit("</script></head><body>x</body></html>"),
        ),
    ).when(
        m == 1,
        F.concat(
            F.lit("<html><head><script>var notLd = 1;</script>"
                  '<script type="application/ld+json">'),
            ld,
            F.lit("</script></head><body>x</body></html>"),
        ),
    ).otherwise(
        F.lit("<html><head><script>plain()</script></head>"
              "<body>x</body></html>")
    )
    art = html_jsonld_article(html)
    return d.select(
        "doc_id",
        art["@type"].alias("ld_type"),
        art["headline"].alias("headline"),
        art["author"]["name"].alias("author"),
        F.try_to_timestamp(art["datePublished"]).alias("published_ts"),
    )
