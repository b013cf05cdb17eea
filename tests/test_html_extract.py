"""HTML text extraction: the strip/decode contract pinned on
adversarial fixtures, plus composition with the WARC envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_hiveorc_spark.functions.html import (
    html_links,
    html_stats,
    html_title,
    html_to_text,
)


def _extract(spark, html: str) -> dict:
    row = (
        spark.createDataFrame([(1, html)], "doc_id long, html string")
        .select(
            html_to_text("html").alias("text"),
            html_title("html").alias("title"),
            html_links("html").alias("links"),
        )
        .collect()[0]
    )
    return {"text": row.text, "title": row.title, "links": row.links}


def test_basic_page(spark):
    got = _extract(
        spark,
        "<html><head><title> My Page </title></head>"
        "<body><h1>Hello</h1><p>World <b>bold</b> text.</p></body></html>",
    )
    assert got["text"] == "My Page Hello World bold text."
    assert got["title"] == "My Page"
    assert got["links"] == []


def test_script_style_comment_content_dropped(spark):
    got = _extract(
        spark,
        "<style>p { margin: 0; }</style>"
        "<script>\nif (a < b && c > d) { alert('<p>'); }\n</script>"
        "<!-- hidden <em>markup</em> -->visible"
        "<SCRIPT>upper case too</SCRIPT>",
    )
    assert got["text"] == "visible"


def test_script_ends_at_first_close_tag_like_html5(spark):
    # the HTML5 raw-text rule: '</script>' inside a JS string still
    # terminates the element; the remainder is parsed as markup
    got = _extract(spark, "<script>var s = 'x</script>rest';<p>tail</p>")
    assert got["text"] == "rest'; tail"


def test_entity_decode_order_guards_double_decode(spark):
    got = _extract(
        spark,
        "<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; more&nbsp;"
        "and &amp;lt; stays</p>",
    )
    assert got["text"] == "a <tag> \"q\" 's' & more and &lt; stays"


def test_unknown_entities_pass_through(spark):
    got = _extract(spark, "<p>&copy; &hearts; &#x1F600;</p>")
    assert got["text"] == "&copy; &hearts; &#x1F600;"


def test_links_both_quote_styles_and_title_absent(spark):
    got = _extract(
        spark,
        '<a href="https://a.test/1">one</a> mid '
        "<A HREF='/rel/path'>two</A> <a name=anchor>no href</a>",
    )
    assert got["links"] == ["https://a.test/1", "/rel/path"]
    assert got["title"] == ""
    assert got["text"] == "one mid two no href"


def test_whitespace_collapse_and_multiline(spark):
    got = _extract(
        spark, "<div>\n  line one\n\t<span>line\ntwo</span>\n</div>\n"
    )
    assert got["text"] == "line one line two"


def test_html_stats_composes_with_warc_blocks(spark):
    """The intended pipeline: WARC response blocks (HTML bytes) →
    web_archive_records → cast → html_stats."""
    from tests.test_web_archive import _warc_record
    from flink_hiveorc_spark.functions.archive import web_archive_records

    page = (
        b"<html><head><title>T1</title></head>"
        b'<body><p>crawled body</p><a href="https://l.test/x">l</a>'
        b"</body></html>"
    )
    warc = _warc_record("response", "https://l.test", page)
    recs = web_archive_records(
        spark.createDataFrame(
            [(5, bytearray(warc))], "doc_id long, payload binary"
        )
    )
    out = html_stats(
        recs.select("doc_id", F.decode("block", "utf-8").alias("html"))
    ).collect()[0]
    assert out.title == "T1"
    assert out.body_text == "T1 crawled body l"
    assert out.n_links == 1
    assert out.text_chars == len("T1 crawled body l")


# -------------------------------------------------------- Markdown


def _md(spark, md: str) -> str:
    from flink_hiveorc_spark.functions.html import markdown_to_text

    return (
        spark.createDataFrame([(1, md)], "doc_id long, md string")
        .select(markdown_to_text("md").alias("t"))
        .collect()[0]
        .t
    )


def test_markdown_basic_strip(spark):
    md = (
        "# Head\n\nplain **bold** *ital* __b2__ _i2_\n\n"
        "- one\n- two\n\n1. first\n2. second\n\n> quote\n"
    )
    assert _md(spark, md) == (
        "Head plain bold ital b2 i2 one two first second quote"
    )


def test_markdown_code_fence_content_is_literal(spark):
    md = "before\n\n```\n# not a heading\n- not a list\n```\n\nafter"
    assert _md(spark, md) == "before after"


def test_markdown_inline_code_links_images(spark):
    md = (
        "see [docs](https://d.test/x) and ![logo alt](l.png) "
        "plus `inline()` code"
    )
    assert _md(spark, md) == "see docs and logo alt plus inline() code"


def test_markdown_snake_case_survives_italics_rule(spark):
    # mid-identifier underscores must NOT parse as emphasis
    md = "call snake_case_name and _really italic_"
    assert _md(spark, md) == "call snake_case_name and really italic"


def test_markdown_thematic_break_drops(spark):
    assert _md(spark, "a\n\n---\n\nb") == "a b"


def test_html_canonical_and_meta_robots(spark):
    from flink_hiveorc_spark.functions.html import (
        html_canonical,
        html_meta_robots,
    )

    cases = [
        # (html, canonical, noindex, nofollow)
        ('<link rel="canonical" href="https://a/b">', "https://a/b",
         False, False),
        ('<link href="https://a/c" rel="canonical">', "https://a/c",
         False, False),
        ("<link rel=canonical href='https://a/d'>", "https://a/d",
         False, False),
        ('<link rel="stylesheet" href="/s.css">', "", False, False),
        ('<meta name="robots" content="noindex">', "", True, False),
        ('<meta name=ROBOTS content=" NOFOLLOW ">', "", False, True),
        ('<meta name="robots" content="none">', "", True, True),
        ('<meta name="robots" content="noindexing">', "", False, False),
        ('<meta name="viewport" content="noindex">', "", False, False),
        ("plain text no tags", "", False, False),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, *_rest) in enumerate(cases)],
        "i long, html string",
    )
    mr = html_meta_robots("html")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            html_canonical("html").alias("c"),
            mr["noindex"].alias("ni"),
            mr["nofollow"].alias("nf"),
        ).collect()
    }
    for i, (h, want_c, want_ni, want_nf) in enumerate(cases):
        assert got[i]["c"] == want_c, h
        assert got[i]["ni"] is want_ni, h
        assert got[i]["nf"] is want_nf, h


def test_html_opengraph(spark):
    from flink_hiveorc_spark.functions.html import html_opengraph

    cases = [
        ('<meta property="og:title" content="The Title">', "title",
         "The Title"),
        ('<meta content="https://i/x.jpg" property="og:image">', "image",
         "https://i/x.jpg"),
        ("<meta property=og:title content='Unquoted prop'>", "title",
         "Unquoted prop"),
        ('<meta property="og:description" content="d">', "title", ""),
        ('<meta name="og:title" content="name-not-property">', "title",
         ""),
        ("no tags", "image", ""),
    ]
    df = spark.createDataFrame(
        [(i, h, p) for i, (h, p, _) in enumerate(cases)],
        "i long, html string, prop string",
    )
    # per-row prop differs; run per distinct prop value
    for i, (h, p, want) in enumerate(cases):
        got = (
            spark.createDataFrame([(h,)], "html string")
            .select(html_opengraph("html", p).alias("v"))
            .collect()[0]["v"]
        )
        assert got == want, (h, p)


def test_html_jsonld(spark):
    from flink_hiveorc_spark.functions.html import (
        html_jsonld_article,
        html_jsonld_block,
    )

    page = (
        "<html><head><script>var x=1;</script>"
        '<script type="application/ld+json">'
        '{"@type":"Article","headline":"H1","datePublished":'
        '"2024-05-05","author":{"name":"A. Author"}}'
        "</script></head><body>x</body></html>"
    )
    df = spark.createDataFrame(
        [(1, page), (2, "<html>no ld</html>"),
         (3, '<script type="application/ld+json">not json{</script>')],
        "doc_id long, html string",
    )
    art = html_jsonld_article("html")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            html_jsonld_block("html").alias("raw"),
            art["@type"].alias("t"),
            art["headline"].alias("h"),
            art["author"]["name"].alias("a"),
        ).collect()
    }
    assert got[1]["t"] == "Article" and got[1]["h"] == "H1"
    assert got[1]["a"] == "A. Author"
    assert got[2]["raw"] == "" and got[2]["t"] is None
    # malformed JSON -> NULLs, never an error (crawl noise)
    assert got[3]["t"] is None
