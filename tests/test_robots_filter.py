"""robots.txt parsing (the JVM aggregate-fold) + frontier filtering:
group-header tracking, googlebot-group isolation, longest-match
precedence with Allow winning ties, empty-Disallow no-op, comments,
the no-robots allow convention, and the host-grained join path."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_hiveorc_spark.functions.robots import (
    frontier_filter,
    robots_allowed,
    robots_rules,
)


def _rules(spark, txt: str):
    return (
        spark.createDataFrame([(txt,)], "t string")
        .select(robots_rules("t").alias("r"))
        .collect()[0]["r"]
    )


def _allowed(spark, txt: str, path: str) -> bool:
    return (
        spark.createDataFrame([(txt, path)], "t string, p string")
        .select(robots_allowed("p", robots_rules("t")).alias("a"))
        .collect()[0]["a"]
    )


ROBOTS = """# comments everywhere
User-agent: googlebot
Disallow: /

User-agent: other
User-agent: *
Disallow:    # empty value: no-op
Disallow: /private/
Allow: /private/pub/
Disallow: /tmp
"""


def test_fold_extracts_only_star_group(spark):
    rules = [(r["allow"], r["path"]) for r in _rules(spark, ROBOTS)]
    # the googlebot-group 'Disallow: /' must NOT leak in
    assert rules == [
        (False, "/private/"),
        (True, "/private/pub/"),
        (False, "/tmp"),
    ]


def test_precedence_longest_match_allow_wins(spark):
    assert _allowed(spark, ROBOTS, "/private/x") is False
    assert _allowed(spark, ROBOTS, "/private/pub/y") is True
    assert _allowed(spark, ROBOTS, "/tmpfile") is False  # prefix match
    assert _allowed(spark, ROBOTS, "/open/z") is True  # no match


def test_star_group_first_and_header_reset(spark):
    # a * group FOLLOWED by a more specific group: the later group's
    # rules must not leak into *
    txt = "User-agent: *\nDisallow: /a\n\nUser-agent: bingbot\nDisallow: /b\n"
    rules = [(r["allow"], r["path"]) for r in _rules(spark, txt)]
    assert rules == [(False, "/a")]
    # two agent lines NOT separated by rules share a group
    txt2 = "User-agent: x\nUser-agent: *\nDisallow: /c\n"
    assert [(r["allow"], r["path"]) for r in _rules(spark, txt2)] == [
        (False, "/c")
    ]
    # an agent line AFTER rules starts a NEW group (star resets)
    txt3 = "User-agent: *\nDisallow: /d\nUser-agent: y\nDisallow: /e\n"
    assert [(r["allow"], r["path"]) for r in _rules(spark, txt3)] == [
        (False, "/d")
    ]


def test_frontier_filter_join_path(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://a.test/private/x"),
            (2, "https://a.test/private/pub/x"),
            (3, "https://b.test/anything"),   # host without robots
            (4, "https://a.test/ok"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.test", ROBOTS)], "host string, robots_txt string"
    )
    got = {r["doc_id"]: r["allowed"] for r in frontier_filter(urls, robots).collect()}
    assert got == {1: False, 2: True, 3: True, 4: True}


def test_empty_robots_allows_everything(spark):
    assert _allowed(spark, "", "/anything") is True
    assert _allowed(spark, "User-agent: *\n", "/x") is True


def test_robots_sitemap_directives(spark):
    from flink_hiveorc_spark.functions.robots import robots_sitemaps

    txt = (
        "Sitemap: https://a.test/sitemap.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap:   https://a.test/s2.xml   \n"
    )
    got = (
        spark.createDataFrame([(txt,)], "t string")
        .select(robots_sitemaps("t").alias("s"))
        .collect()[0]["s"]
    )
    assert got == ["https://a.test/sitemap.xml", "https://a.test/s2.xml"]


def _allowed_as(spark, txt: str, path: str, agent: str) -> bool:
    return (
        spark.createDataFrame([(txt, path)], "t string, p string")
        .select(
            robots_allowed("p", robots_rules("t", agent=agent)).alias("a")
        )
        .collect()[0]["a"]
    )


WILD = """User-agent: mybot
Disallow: /*.php$
Disallow: /*?
Allow: /shop*.php$
Disallow: /a$b

User-agent: *
Disallow: /
"""


def test_wildcard_and_anchor_matching(spark):
    # one DataFrame, one collect
    cases = [
        ("/x.php", False),        # /*.php$
        ("/x.php?q=1", False),    # $ broken, but /*? fires on query
        ("/x.phpX", True),        # $ anchor holds
        ("/dir/deep/y.php", False),  # * spans path segments
        ("/shop-sale.php", True),  # longer Allow (raw octets) wins
        ("/plain", True),          # no match (star group ignored!)
        ("/a$b-literal", False),   # mid-path $ is a literal octet
    ]
    df = spark.createDataFrame(
        [(WILD, p) for p, _ in cases], "t string, p string"
    )
    got = df.select(
        "p",
        robots_allowed("p", robots_rules("t", agent="mybot")).alias("a"),
    ).collect()
    for r, (p, want) in zip(got, cases):
        assert r["a"] is want, p


def test_agent_group_selection(spark):
    txt = (
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: MyBot\nDisallow: /m\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    # exact (case-insensitive) group wins: /m denied, everything else allowed
    assert _allowed_as(spark, txt, "/m/x", "mybot") is False
    assert _allowed_as(spark, txt, "/g/x", "mybot") is True
    assert _allowed_as(spark, txt, "/open", "mybot") is True
    # unknown agent falls back to the * group
    assert _allowed_as(spark, txt, "/open", "nobot") is False
    # repeated groups for the same token MERGE (RFC 9309 §2.2.1)
    txt2 = (
        "User-agent: mybot\nDisallow: /a\n\n"
        "User-agent: mybot\nDisallow: /b\n"
    )
    assert _allowed_as(spark, txt2, "/a1", "mybot") is False
    assert _allowed_as(spark, txt2, "/b1", "mybot") is False
    assert _allowed_as(spark, txt2, "/c1", "mybot") is True
    # an exact group that allows everything still SHADOWS the * group
    txt3 = "User-agent: mybot\nAllow: /\n\nUser-agent: *\nDisallow: /\n"
    assert _allowed_as(spark, txt3, "/anything", "mybot") is True


def test_frontier_filter_agent_and_query(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://a.test/x.php"),
            (2, "https://a.test/x.html?session=1"),
            (3, "https://a.test/x.html"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            (
                "a.test",
                "User-agent: mybot\nDisallow: /*.php$\n"
                "Disallow: /*?session=\n\nUser-agent: *\nDisallow: /\n",
            )
        ],
        "host string, robots_txt string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in frontier_filter(urls, robots, agent="mybot").collect()
    }
    assert got == {1: False, 2: False, 3: True}


def test_robots_fold_differential_vs_reference(spark):
    """Differential: 200 grammar-generated robots.txt files parsed by
    the JVM fold must match an INDEPENDENT Python reference
    implementation of RFC 9309 group selection (exact-token lane vs
    *, merged across repeated groups) AND the wildcard/anchor
    matching + longest-match precedence, probing 3 paths per file —
    one DataFrame, one collect (not per-example Spark runs)."""
    import random
    import re as _re

    rng = random.Random(1409)
    PATH_POOL = [
        "/a", "/b", "/c", "/a/b", "/d", "", "/*.php$", "/*?", "/a*c",
        "/*session=", "/x$", "/shop*.php$",
    ]
    PROBE_POOL = [
        "/a", "/a/b", "/ac", "/abc", "/x.php", "/x.php?q=1", "/shop.php",
        "/b?session=1", "/x", "/x$y", "/aXc", "/d/e",
    ]

    def gen_robots() -> str:
        lines = []
        for _ in range(rng.randint(1, 14)):
            r = rng.random()
            if r < 0.3:
                agent = rng.choice(
                    ["*", "googlebot", "other", "X", "mybot", "MyBot"]
                )
                lines.append(f"User-agent: {agent}")
            elif r < 0.55:
                lines.append(f"Disallow: {rng.choice(PATH_POOL)}")
            elif r < 0.75:
                lines.append(f"Allow: {rng.choice(PATH_POOL)}")
            elif r < 0.85:
                lines.append("")
            elif r < 0.95:
                lines.append("# comment")
            else:
                lines.append("Crawl-delay: 5")
        return "\n".join(lines) + "\n"

    def ref_rules(txt: str, agent: str | None) -> list[tuple[bool, str]]:
        star_rules: list[tuple[bool, str]] = []
        exact_rules: list[tuple[bool, str]] = []
        star = exact = in_header = saw_exact = False
        for raw in txt.split("\n"):
            line = raw.split("#", 1)[0].strip()
            low = line.lower()
            if low.startswith("user-agent:"):
                tok = line.split(":", 1)[1].strip()
                if not in_header:
                    star = exact = False
                star = star or tok == "*"
                exact = exact or (
                    agent is not None and tok.lower() == agent.lower()
                )
                saw_exact = saw_exact or exact
                in_header = True
                continue
            in_header = False
            for allow, d in ((True, "allow:"), (False, "disallow:")):
                if low.startswith(d):
                    path = line.split(":", 1)[1].strip()
                    if path:
                        if star:
                            star_rules.append((allow, path))
                        if exact:
                            exact_rules.append((allow, path))
        return exact_rules if saw_exact else star_rules

    def ref_match(rule: str, path: str) -> bool:
        anchored = rule.endswith("$")
        body = rule[:-1] if anchored else rule
        pat = "".join(
            ".*" if ch == "*" else _re.escape(ch) for ch in body
        )
        return (
            _re.search("^" + pat + ("$" if anchored else ""), path)
            is not None
        )

    def ref_allowed(rules, path: str) -> bool:
        best = None
        for allow, rule in rules:
            if ref_match(rule, path):
                key = (len(rule), 1 if allow else 0)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1] == 1

    texts = [gen_robots() for _ in range(200)]
    probes = [
        [rng.choice(PROBE_POOL) for _ in range(3)] for _ in texts
    ]
    df = spark.createDataFrame(
        [
            (i, t, ps[0], ps[1], ps[2])
            for i, (t, ps) in enumerate(zip(texts, probes))
        ],
        "i long, t string, p0 string, p1 string, p2 string",
    )
    rules_col = robots_rules("t", agent="mybot")
    got = {
        r["i"]: (
            [(x["allow"], x["path"]) for x in r["r"]],
            [r["a0"], r["a1"], r["a2"]],
        )
        for r in df.select(
            "i",
            rules_col.alias("r"),
            robots_allowed("p0", rules_col).alias("a0"),
            robots_allowed("p1", rules_col).alias("a1"),
            robots_allowed("p2", rules_col).alias("a2"),
        ).collect()
    }
    for i, (t, ps) in enumerate(zip(texts, probes)):
        rules = ref_rules(t, "mybot")
        assert got[i][0] == rules, f"case {i}:\n{t!r}"
        want = [ref_allowed(rules, p) for p in ps]
        assert got[i][1] == want, f"case {i} probes {ps}:\n{t!r}"


def test_crawl_delay_group_selection(spark):
    from flink_hiveorc_spark.functions.robots import robots_crawl_delay

    txt = (
        "User-agent: mybot\nCrawl-delay: junk\nCrawl-delay: 1\n"
        "Crawl-delay: 2.5\n\n"
        "User-agent: *\nCrawl-delay: 99\n"
    )
    df = spark.createDataFrame([(txt,)], "t string")
    row = df.select(
        robots_crawl_delay("t", agent="mybot").alias("mine"),
        robots_crawl_delay("t", agent="nobot").alias("star"),
        robots_crawl_delay("t").alias("default"),
    ).collect()[0]
    # last numeric value in the selected group wins; junk ignored
    assert row["mine"] == 2.5
    assert row["star"] == 99.0 and row["default"] == 99.0
    # no delay anywhere -> NULL
    df2 = spark.createDataFrame([("User-agent: *\nDisallow: /x\n",)], "t string")
    assert df2.select(robots_crawl_delay("t").alias("d")).collect()[0]["d"] is None
