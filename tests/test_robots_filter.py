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


def test_robots_fold_differential_vs_reference(spark):
    """Differential: 200 grammar-generated robots.txt files parsed by
    the JVM fold must match an INDEPENDENT 15-line Python reference
    implementation of the same RFC 9309 subset — one DataFrame, one
    collect (not per-example Spark runs)."""
    import random

    rng = random.Random(1409)

    def gen_robots() -> str:
        lines = []
        for _ in range(rng.randint(1, 14)):
            r = rng.random()
            if r < 0.3:
                agent = rng.choice(["*", "googlebot", "other", "X"])
                lines.append(f"User-agent: {agent}")
            elif r < 0.55:
                lines.append(f"Disallow: /{rng.choice(['a','b','c',''])}")
            elif r < 0.75:
                lines.append(f"Allow: /{rng.choice(['a','a/b','d'])}")
            elif r < 0.85:
                lines.append("")
            elif r < 0.95:
                lines.append("# comment")
            else:
                lines.append("Crawl-delay: 5")
        return "\n".join(lines) + "\n"

    def reference(txt: str) -> list[tuple[bool, str]]:
        rules, star, in_header = [], False, False
        for raw in txt.split("\n"):
            line = raw.split("#", 1)[0].strip()
            low = line.lower()
            if low.startswith("user-agent:"):
                agent = line.split(":", 1)[1].strip()
                star = (star if in_header else False) or agent == "*"
                in_header = True
                continue
            in_header = False
            for allow, d in ((True, "allow:"), (False, "disallow:")):
                if low.startswith(d):
                    path = line.split(":", 1)[1].strip()
                    if star and path:
                        rules.append((allow, path))
        return rules

    texts = [gen_robots() for _ in range(200)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    from flink_hiveorc_spark.functions.robots import robots_rules

    got = {
        r["i"]: [(x["allow"], x["path"]) for x in r["r"]]
        for r in df.select("i", robots_rules("t").alias("r")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == reference(t), f"case {i}:\n{t!r}"
