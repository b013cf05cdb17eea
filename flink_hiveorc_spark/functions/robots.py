"""robots.txt parsing + frontier filtering — the crawl-politeness
step between URL discovery (sitemaps/feeds/links) and fetching: a
pipeline must drop frontier URLs the host's robots.txt disallows.

Everything is JVM-side. The group semantics of robots.txt (RFC 9309:
consecutive User-agent lines form a group header; the following
Allow/Disallow rules belong to that group) are SEQUENTIAL, which
column functions usually can't express — here they run as a single
``F.aggregate`` FOLD over the split lines with a small struct state
(current-group membership flags, was-the-previous-line-a-group-header,
rules so far), so parsing stays whole-stage-codegen with zero Python.

Group selection is RFC 9309 §2.2.1 complete: the fold carries TWO
rule lanes — the ``*`` group and the group(s) whose agent token
case-insensitively equals the crawler's product token — and the
crawler's effective rule set is the exact-token lane when any group
named it, else the ``*`` lane (groups repeating a token merge, as the
RFC requires).

Matching is RFC 9309 §2.2.2/§2.2.3 complete: rule paths support the
``*`` wildcard (matches any run of octets) and a trailing ``$``
end-anchor — both MUST-level in the RFC and ubiquitous in real files
(``Disallow: /*.php$``, ``/*?``). Each wildcard rule compiles to a
Java regex JVM-side (escape metacharacters, ``*`` → ``.*``, trailing
``$`` → anchor); plain-prefix rules (the overwhelming majority) keep
the fast ``startsWith`` path. Precedence: the rule with the most raw
octets wins, Allow beats Disallow on ties, no matching rule means
allowed. Rules match against the PATH PLUS QUERY (that is the string
``/*?session=``-style rules exist for); rule paths are matched as
written (RFC 9309 leaves percent-encoding equivalence to the
fetcher — frontier URLs normalized by functions/urls.py already
carry the canonical encoding).

Reference repo has no crawl surface (SURVEY.md §0); need comes from
the r13/r14 crawl envelope (WARC → links → sitemap/feeds → frontier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

# NOTE: functions.urls is imported INSIDE the consumers (the
# html.py pattern): a module-level `from ..urls import name` here
# deadlocks the registry's _load_all cycle whenever urls is the
# process's first import (robots loads before urls alphabetically,
# and urls' own body hasn't defined the name yet).


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _empty_rules() -> Column:
    # built lazily: F.array() resolves against the active session,
    # which does not exist at import time
    return F.array().cast("array<struct<allow: boolean, path: string>>")


def _robots_fold(col, agent: str | None = None) -> Column:
    """The shared fold (module doc): robots.txt text → final state
    struct with both lanes' rules + crawl-delays + saw_exact."""
    lines = F.split(_c(col), "\n")
    agent_lit = F.lit((agent or "").lower())
    has_agent = agent is not None
    init = F.struct(
        F.lit(False).alias("star"),
        F.lit(False).alias("exact"),
        F.lit(False).alias("in_header"),
        F.lit(False).alias("saw_exact"),
        _empty_rules().alias("star_rules"),
        _empty_rules().alias("exact_rules"),
        F.lit(None).cast("double").alias("star_delay"),
        F.lit(None).cast("double").alias("exact_delay"),
    )

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*$", ""))
        low = F.lower(line)
        is_agent = low.startswith("user-agent:")
        tok = F.trim(F.substring_index(line, ":", -1))
        is_allow = low.startswith("allow:")
        is_dis = low.startswith("disallow:")
        is_delay = low.startswith("crawl-delay:")
        path = F.trim(
            F.substring(line, F.instr(line, ":") + 1, F.length(line))
        )
        # header accumulation: agent lines extend the current header;
        # the first agent line after anything else starts a new group
        star_base = F.when(acc["in_header"], acc["star"]).otherwise(
            F.lit(False)
        )
        exact_base = F.when(acc["in_header"], acc["exact"]).otherwise(
            F.lit(False)
        )
        tok_exact = (
            (F.lower(tok) == agent_lit) if has_agent else F.lit(False)
        )
        star_next = F.when(
            is_agent, star_base | (tok == "*")
        ).otherwise(acc["star"])
        exact_next = F.when(is_agent, exact_base | tok_exact).otherwise(
            acc["exact"]
        )
        rule = F.struct(is_allow.alias("allow"), path.alias("path"))
        is_rule = (is_allow | is_dis) & (path != "")
        star_rules_next = F.when(
            is_rule & acc["star"], F.array_append(acc["star_rules"], rule)
        ).otherwise(acc["star_rules"])
        exact_rules_next = F.when(
            is_rule & acc["exact"],
            F.array_append(acc["exact_rules"], rule),
        ).otherwise(acc["exact_rules"])
        # Crawl-delay (the de-facto extension): numeric value, last
        # one in the crawler's group wins; junk values ignored
        delay_val = path.try_cast("double")
        star_delay_next = F.when(
            is_delay & acc["star"] & delay_val.isNotNull(), delay_val
        ).otherwise(acc["star_delay"])
        exact_delay_next = F.when(
            is_delay & acc["exact"] & delay_val.isNotNull(), delay_val
        ).otherwise(acc["exact_delay"])
        return F.struct(
            star_next.alias("star"),
            exact_next.alias("exact"),
            is_agent.alias("in_header"),
            (acc["saw_exact"] | exact_next).alias("saw_exact"),
            star_rules_next.alias("star_rules"),
            exact_rules_next.alias("exact_rules"),
            star_delay_next.alias("star_delay"),
            exact_delay_next.alias("exact_delay"),
        )

    return F.aggregate(lines, init, step)


def robots_rules(col, agent: str | None = None) -> Column:
    """robots.txt text column → array<struct<allow, path>> of the
    crawler's effective rules, in file order. A single JVM fold:
    comments strip, directive names case-fold, consecutive User-agent
    lines accumulate into a group header, Allow/Disallow lines append
    to the lane(s) whose token the header matched, and an empty rule
    value is the spec's no-op. With ``agent`` given, the exact-token
    group (case-insensitive) wins over ``*`` whenever any group names
    the token — RFC 9309 §2.2.1 most-specific selection; with
    ``agent=None`` only the ``*`` group is consulted."""
    final = _robots_fold(col, agent)
    return F.when(final["saw_exact"], final["exact_rules"]).otherwise(
        final["star_rules"]
    )


def robots_crawl_delay(col, agent: str | None = None) -> Column:
    """The crawler's effective Crawl-delay in seconds (the de-facto
    politeness extension most crawl schedulers honor): the LAST
    numeric Crawl-delay line in the selected group (same two-lane
    RFC 9309 group selection as robots_rules), NULL when the group
    has none or values are junk."""
    final = _robots_fold(col, agent)
    return F.when(final["saw_exact"], final["exact_delay"]).otherwise(
        final["star_delay"]
    )


def robots_rule_regex(path_col) -> Column:
    """Compile a robots.txt rule path to a Java regex string,
    JVM-side (RFC 9309 §2.2.3): escape every regex metacharacter,
    then ``\\*`` (an escaped rule wildcard) → ``.*`` and a TRAILING
    escaped ``$`` → the end anchor (a ``$`` anywhere else stays a
    literal octet, per the RFC's grammar). Anchored at the start, so
    ``regexp_like`` (find semantics) gives prefix matching."""
    esc = F.regexp_replace(
        _c(path_col), r"([\\.\[\]{}()+?^$|*])", r"\\$1"
    )
    wild = F.regexp_replace(esc, r"\\\*", ".*")
    anchored = F.regexp_replace(wild, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), anchored)


def _rule_matches(p: Column, rule_path: Column) -> Column:
    """Does one rule match path+query `p`? Plain prefixes (no ``*``,
    no trailing ``$``) keep the fast literal startsWith; wildcard or
    anchored rules go through the compiled regex."""
    needs_regex = rule_path.contains("*") | rule_path.endswith("$")
    return F.when(
        needs_regex, F.regexp_like(p, robots_rule_regex(rule_path))
    ).otherwise(p.startswith(rule_path))


def robots_allowed(path_col, rules_col) -> Column:
    """True iff `path_col` (path + '?query' — use
    functions/urls.url_path_query) is fetchable under `rules_col`
    (the robots_rules output): the matching rule with the most raw
    octets decides, Allow wins length ties, no match allows. Pure
    array expressions — the struct-compare trick (max over
    (length, allow_bit)) IS the RFC precedence."""
    p = _c(path_col)
    rules = _c(rules_col)
    matches = F.filter(rules, lambda r: _rule_matches(p, r["path"]))
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


def frontier_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str | None = None,
) -> DataFrame:
    """Filter a frontier (doc_id, url) against per-host robots.txt
    blobs (host, robots_txt): parse each host's rules ONCE (the
    robots frame is host-grained — broadcast when small, shuffle on
    host otherwise; AQE decides), join on the url's host, and keep
    the verdict column. URLs whose host has no robots.txt are
    allowed (the fetch-404 convention). `agent` is the crawler's
    product token for most-specific group selection."""
    from flink_hiveorc_spark.functions.urls import (
        url_host,
        url_path_query,
    )

    parsed = robots.select(
        "host", robots_rules("robots_txt", agent=agent).alias("rules")
    )
    u = urls.withColumn("_host", url_host(url_col))
    joined = u.join(parsed, u["_host"] == parsed["host"], "left")
    return joined.select(
        *[c for c in urls.columns],
        F.coalesce(
            robots_allowed(url_path_query(url_col), F.col("rules")),
            F.lit(True),
        ).alias("allowed"),
    )


@query(
    "pipeline_robots_filter",
    oracle="""
    WITH base AS (SELECT doc_id, doc_id % 6 AS m FROM documents)
    SELECT doc_id,
           CASE m WHEN 0 THEN 'https://crawl-' || doc_id % 7
                    || '.test/private-' || doc_id || '/x'
                  WHEN 1 THEN 'https://crawl-' || doc_id % 7
                    || '.test/private-' || doc_id || '/pub/y'
                  WHEN 2 THEN 'https://crawl-' || doc_id % 7
                    || '.test/open/' || doc_id
                  WHEN 3 THEN 'https://crawl-' || doc_id % 7
                    || '.test/page-' || doc_id || '.php'
                  WHEN 4 THEN 'https://crawl-' || doc_id % 7
                    || '.test/page-' || doc_id || '.php?x=1'
                  ELSE 'https://crawl-' || doc_id % 7
                    || '.test/open/' || doc_id || '?session=abc'
           END AS url,
           CASE WHEN m IN (0, 3, 5) THEN FALSE ELSE TRUE END AS allowed,
           CAST(2.5 AS DOUBLE) AS crawl_delay
    FROM base
    """,
)
def pipeline_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier filtering under a GROUND-TRUTH oracle, crawling as
    product token "mybot". Each doc's host ships a robots.txt with
    (a) a googlebot group that disallows everything (must be
    ignored), (b) a ``MyBot`` group (case-insensitive exact token
    match) carrying the real rules, and (c) a two-line-header
    ``other``/``*`` group that ALSO disallows everything — the
    agent-specific-group decoy: an implementation that only consults
    the ``*`` group denies every URL here. The mybot rules exercise
    the RFC 9309 wildcard grammar: a data-dependent
    ``Disallow: /private-N/`` with a LONGER ``Allow:
    /private-N/pub/`` carve-out, ``Disallow: /*.php$`` (wildcard +
    end anchor), and ``Disallow: /*?session=`` (wildcard reaching
    into the query string), plus comments and an empty Disallow
    no-op. Six frontier URLs per doc (doc_id % 6) probe: deny by
    prefix, carve-out allow (longest match beats the disallow),
    no-match allow (the decoy leg), deny by ``*.php$``, allow when a
    query breaks the ``$`` anchor (path+query matching), and deny by
    the query-string wildcard. The crawl_delay column must be the
    mybot group's 2.5 — skipping the junk 'fast' value and ignoring
    the ``*`` group's 99 decoy. DuckDB recomputes the expected
    verdicts as CASE literals — group selection, wildcard compile,
    and precedence all have to agree. Scale: robots parse once per
    HOST (host-grain frame), frontier joins on host; here both
    frames derive map-only."""
    from flink_hiveorc_spark.functions.urls import url_path_query

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 7).cast("string")
    m = F.col("doc_id") % 6
    host = F.concat(F.lit("crawl-"), h, F.lit(".test"))
    robots_txt = F.concat(
        F.lit(
            "# robots fixture\n"
            "User-agent: googlebot\n"
            "Disallow: /\n"
            "\n"
            "User-agent: MyBot\n"
            "Disallow:   # empty value is a no-op\n"
            "Disallow: /private-"
        ),
        did,
        F.lit("/\nAllow: /private-"),
        did,
        F.lit(
            "/pub/\n"
            "Disallow: /*.php$\n"
            "Disallow: /*?session=\n"
            "Crawl-delay: fast   # junk value must be ignored\n"
            "Crawl-delay: 2.5\n"
            "\n"
            "User-agent: other\n"
            "User-agent: *\n"
            "Disallow: /\n"
            "Crawl-delay: 99\n"
        ),
    )
    url = F.when(
        m == 0,
        F.concat(F.lit("https://"), host, F.lit("/private-"), did,
                 F.lit("/x")),
    ).when(
        m == 1,
        F.concat(F.lit("https://"), host, F.lit("/private-"), did,
                 F.lit("/pub/y")),
    ).when(
        m == 2,
        F.concat(F.lit("https://"), host, F.lit("/open/"), did),
    ).when(
        m == 3,
        F.concat(F.lit("https://"), host, F.lit("/page-"), did,
                 F.lit(".php")),
    ).when(
        m == 4,
        F.concat(F.lit("https://"), host, F.lit("/page-"), did,
                 F.lit(".php?x=1")),
    ).otherwise(
        F.concat(F.lit("https://"), host, F.lit("/open/"), did,
                 F.lit("?session=abc"))
    )
    # fixture note: the rules are doc-dependent (the /private-N/
    # path), so the oracle query parses per doc and filters in place;
    # the host-grained frontier_filter JOIN path is covered by its
    # own test on genuinely host-grained robots frames.
    #
    # Perf shape (r15 optimization round): the fold is materialized
    # ONCE through a projection boundary and both outputs (rules →
    # allowed, delay) derive from that column. Composing
    # robots_rules(...) + robots_crawl_delay(...) inline instead
    # re-folds the text per consumer — Catalyst inlines the shared
    # subtree into every CASE branch, NINE fold copies in the final
    # plan (measured). With the boundary + a scan fan-out
    # (single-row-group documents file, guide §2.5) the query runs
    # 4.7–5.9 → 0.6–1.6 s at sf0.1; same rows, oracle re-verified.
    from flink_hiveorc_spark.catalog import parallelize_small_scan

    st = _robots_fold(robots_txt, agent="mybot")
    folded = parallelize_small_scan(d).select(
        "doc_id", url.alias("url"), st.alias("_st")
    )
    s = F.col("_st")
    rules = F.when(s["saw_exact"], s["exact_rules"]).otherwise(
        s["star_rules"]
    )
    delay = F.when(s["saw_exact"], s["exact_delay"]).otherwise(
        s["star_delay"]
    )
    return folded.select(
        "doc_id",
        "url",
        robots_allowed(url_path_query(F.col("url")), rules).alias(
            "allowed"
        ),
        delay.alias("crawl_delay"),
    )


@query(
    "pipeline_recrawl_schedule",
    oracle="""
    WITH base AS (
      SELECT doc_id, doc_id % 7 AS h, doc_id % 28 + 1 AS dd
      FROM documents
    ),
    sched AS (
      SELECT h,
             'crawl-' || h || '.test' AS host,
             'https://crawl-' || h || '.test/u/' || doc_id AS loc_norm,
             '2024-03-' || CASE WHEN dd < 10 THEN '0' ELSE '' END || dd
               AS lm
      FROM base
    )
    SELECT host, loc_norm,
           CAST(row_number() OVER (
                  PARTITION BY host ORDER BY lm DESC, loc_norm
                ) AS INT) AS fetch_order,
           CAST((row_number() OVER (
                  PARTITION BY host ORDER BY lm DESC, loc_norm
                ) - 1) * (h + 1) AS DOUBLE) AS wait_s
    FROM sched
    """,
)
def pipeline_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-politeness SCHEDULER — the composition the r14/r15
    discovery stack exists for: sitemap ingest (typed lastmod_ts)
    → robots frontier filtering (RFC 9309 group selection; the
    ``/v/`` half of every sitemap is disallowed for mybot and a
    ``*`` decoy group disallows everything) → per-host fetch
    ordering by recency (lastmod_ts DESC, loc tiebreak) → a wait
    schedule spaced by the host's Crawl-delay ((order-1) × delay
    seconds). DuckDB recomputes the surviving rows + the window +
    the arithmetic from raw concat; the robots verdicts and delays
    are implicit (only /u/ rows appear, spaced by h+1 s). Scale:
    the robots frame is HOST-grain (broadcastable at any scale),
    sitemap parse is map-only, and the only shuffle is the per-host
    window — the grain a real scheduler needs anyway."""
    from flink_hiveorc_spark.functions.urls import (
        sitemap_entries,
        url_host,
        url_path_query,
    )
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 7).cast("string")
    dd = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    host = F.concat(F.lit("crawl-"), h, F.lit(".test"))
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9"><url><loc>https://'),
        host, F.lit("/u/"), did,
        F.lit("</loc><lastmod>2024-03-"), dd,
        F.lit("</lastmod></url><url><loc>https://"),
        host, F.lit("/v/"), did,
        F.lit("</loc><lastmod>2024-03-"), dd,
        F.lit("</lastmod></url></urlset>"),
    )
    # Fan the single-row-group scan out before the per-row XML parse
    # (guide §2.5 — from_xml + the loc normalizer are the heavy
    # map-side work here; measured with the robots-filter fix class,
    # no-op at real scale where scan partitions ≥ cores).
    from flink_hiveorc_spark.catalog import parallelize_small_scan

    entries = sitemap_entries(
        parallelize_small_scan(d).select("doc_id", xml.alias("xml"))
    )
    ent = entries.withColumn("host", url_host(F.col("loc_norm")))

    # host-grain robots dim: 7 hosts, each with a mybot group
    # (Disallow /v/ + its own Crawl-delay) and a disallow-all * decoy
    hosts = (
        d.select((F.col("doc_id") % 7).alias("hn"))
        .distinct()
        .select(
            F.concat(F.lit("crawl-"), F.col("hn").cast("string"),
                     F.lit(".test")).alias("host"),
            F.concat(
                F.lit("User-agent: mybot\nDisallow: /v/\nCrawl-delay: "),
                (F.col("hn") + 1).cast("string"),
                F.lit("\n\nUser-agent: *\nDisallow: /\n"),
            ).alias("robots_txt"),
        )
    )
    parsed = F.broadcast(
        hosts.select(
            "host",
            robots_rules("robots_txt", agent="mybot").alias("rules"),
            robots_crawl_delay("robots_txt", agent="mybot").alias(
                "delay"
            ),
        )
    )
    allowed = (
        ent.join(parsed, "host")
        .filter(
            robots_allowed(url_path_query(F.col("loc_norm")),
                           F.col("rules"))
        )
    )
    w = Window.partitionBy("host").orderBy(
        F.col("lastmod_ts").desc(), F.col("loc_norm")
    )
    return allowed.select(
        "host",
        "loc_norm",
        F.row_number().over(w).cast("int").alias("fetch_order"),
        ((F.row_number().over(w) - 1).cast("double")
         * F.col("delay")).alias("wait_s"),
    )
