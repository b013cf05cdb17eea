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
