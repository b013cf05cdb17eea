"""robots.txt parsing + frontier filtering — the crawl-politeness
step between URL discovery (sitemaps/feeds/links) and fetching: a
pipeline must drop frontier URLs the host's robots.txt disallows.

Everything is JVM-side. The group semantics of robots.txt (RFC 9309:
consecutive User-agent lines form a group header; the following
Allow/Disallow rules belong to that group) are SEQUENTIAL, which
column functions usually can't express — here they run as a single
``F.aggregate`` FOLD over the split lines with a small struct state
(are-we-in-a-*-group, was-the-previous-line-a-group-header, rules so
far), so parsing stays whole-stage-codegen with zero Python.

Matching implements the RFC 9309 precedence subset a deterministic
engine can own: longest-matching rule wins, Allow beats Disallow on
ties, no matching rule means allowed. Scope, documented: literal
PREFIX rules only — ``*`` wildcards and ``$`` anchors inside rule
paths are matched literally (the overwhelming majority of real rules
are plain prefixes); percent-encoding equivalence is out of scope as
in functions/urls.py. Only the ``*`` user-agent group is consulted
(a per-product crawler would pass its own token — the fold
generalizes by swapping the comparison literal).

Reference repo has no crawl surface (SURVEY.md §0); need comes from
the r13/r14 crawl envelope (WARC → links → sitemap/feeds → frontier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query
from flink_hiveorc_spark.functions.urls import url_host, url_path


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _empty_rules() -> Column:
    # built lazily: F.array() resolves against the active session,
    # which does not exist at import time
    return F.array().cast("array<struct<allow: boolean, path: string>>")


def robots_rules(col) -> Column:
    """robots.txt text column → array<struct<allow, path>> of the
    ``*`` group's rules, in file order. A single JVM fold: comments
    strip, directive names case-fold, consecutive User-agent lines
    accumulate into a group header (any of them being ``*`` marks
    the group), Allow/Disallow lines append while the ``*`` group is
    active, and an empty Disallow value is the spec's no-op."""
    lines = F.split(_c(col), "\n")
    init = F.struct(
        F.lit(False).alias("star"),
        F.lit(False).alias("in_header"),
        _empty_rules().alias("rules"),
    )

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*$", ""))
        low = F.lower(line)
        is_agent = low.startswith("user-agent:")
        agent = F.trim(F.substring_index(line, ":", -1))
        is_allow = low.startswith("allow:")
        is_dis = low.startswith("disallow:")
        path = F.trim(
            F.substring(line, F.instr(line, ":") + 1, F.length(line))
        )
        star_next = F.when(
            is_agent & acc["in_header"], acc["star"] | (agent == "*")
        ).when(is_agent, agent == "*").otherwise(acc["star"])
        rule = F.struct(is_allow.alias("allow"), path.alias("path"))
        rules_next = F.when(
            (is_allow | is_dis) & acc["star"] & (path != ""),
            F.array_append(acc["rules"], rule),
        ).otherwise(acc["rules"])
        return F.struct(
            star_next.alias("star"),
            is_agent.alias("in_header"),
            rules_next.alias("rules"),
        )

    return F.aggregate(lines, init, step)["rules"]


def robots_sitemaps(col) -> Column:
    """Array of Sitemap directive URLs from a robots.txt column —
    per RFC 9309 §2.3 these are GROUP-INDEPENDENT (valid anywhere in
    the file), so a plain line filter suffices: the discovery hook
    feeding sitemap_entries (functions/urls.py)."""
    lines = F.split(_c(col), "\n")
    return F.transform(
        F.filter(
            lines,
            lambda l: F.lower(F.trim(l)).startswith("sitemap:"),
        ),
        lambda l: F.trim(
            F.substring(
                F.trim(l), F.instr(F.trim(l), ":") + 1, F.length(l)
            )
        ),
    )


def robots_allowed(path_col, rules_col) -> Column:
    """True iff `path_col` is fetchable under `rules_col` (the
    robots_rules output): longest matching prefix rule decides,
    Allow wins length ties, no match allows. Pure array expressions
    — the struct-compare trick (max over (length, allow_bit)) IS the
    RFC precedence."""
    p = _c(path_col)
    rules = _c(rules_col)
    matches = F.filter(rules, lambda r: p.startswith(r["path"]))
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r["path"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return F.when(F.size(matches) == 0, F.lit(True)).otherwise(
        best["a"] == 1
    )


def frontier_filter(
    urls: DataFrame, robots: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Filter a frontier (doc_id, url) against per-host robots.txt
    blobs (host, robots_txt): parse each host's rules ONCE (the
    robots frame is host-grained — broadcast when small, shuffle on
    host otherwise; AQE decides), join on the url's host, and keep
    the verdict column. URLs whose host has no robots.txt are
    allowed (the fetch-404 convention)."""
    parsed = robots.select(
        "host", robots_rules("robots_txt").alias("rules")
    )
    u = urls.withColumn("_host", url_host(url_col))
    joined = u.join(parsed, u["_host"] == parsed["host"], "left")
    return joined.select(
        *[c for c in urls.columns],
        F.coalesce(
            robots_allowed(url_path(url_col), F.col("rules")), F.lit(True)
        ).alias("allowed"),
    )


@query(
    "pipeline_robots_filter",
    oracle="""
    WITH base AS (SELECT doc_id, doc_id % 3 AS m FROM documents)
    SELECT doc_id,
           CASE m WHEN 0 THEN 'https://crawl-' || doc_id % 7
                    || '.test/private-' || doc_id || '/x'
                  WHEN 1 THEN 'https://crawl-' || doc_id % 7
                    || '.test/private-' || doc_id || '/pub/y'
                  ELSE 'https://crawl-' || doc_id % 7
                    || '.test/open/' || doc_id END AS url,
           CASE m WHEN 0 THEN FALSE ELSE TRUE END AS allowed
    FROM base
    """,
)
def pipeline_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier filtering under a GROUND-TRUTH oracle: each doc's
    host ships a robots.txt with (a) a googlebot group whose rules
    must be IGNORED (it disallows everything), (b) a two-line group
    header (``user-agent: other`` + ``user-agent: *``) that must
    still activate the * rules, (c) a data-dependent
    ``Disallow: /private-N/`` with a LONGER ``Allow:
    /private-N/pub/`` carve-out, plus comments and an empty
    Disallow no-op. Three frontier URLs per doc (doc_id % 3) probe
    deny, carve-out allow (longest-match beats the disallow), and
    no-match allow. DuckDB recomputes the expected verdicts as CASE
    literals — the fold, group tracking, and precedence all have to
    agree. Scale: robots parse once per HOST (host-grain frame),
    frontier joins on host; here both frames derive map-only."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 7).cast("string")
    m = F.col("doc_id") % 3
    host = F.concat(F.lit("crawl-"), h, F.lit(".test"))
    robots_txt = F.concat(
        F.lit(
            "# robots fixture\n"
            "User-agent: googlebot\n"
            "Disallow: /\n"
            "\n"
            "User-agent: other\n"
            "User-agent: *\n"
            "Disallow:   # empty value is a no-op\n"
            "Disallow: /private-"
        ),
        did,
        F.lit("/\nAllow: /private-"),
        did,
        F.lit("/pub/\n"),
    )
    url = F.when(
        m == 0,
        F.concat(F.lit("https://"), host, F.lit("/private-"), did,
                 F.lit("/x")),
    ).when(
        m == 1,
        F.concat(F.lit("https://"), host, F.lit("/private-"), did,
                 F.lit("/pub/y")),
    ).otherwise(
        F.concat(F.lit("https://"), host, F.lit("/open/"), did)
    )
    # fixture note: the rules are doc-dependent (the /private-N/
    # path), so the oracle query parses per doc and filters in place;
    # the host-grained frontier_filter JOIN path is covered by its
    # own test on genuinely host-grained robots frames
    rules = robots_rules(robots_txt)
    return d.select(
        "doc_id",
        url.alias("url"),
        robots_allowed(url_path(url), rules).alias("allowed"),
    )
