"""robots.txt policy filtering (pages/robots.py)."""

import pandas as pd

from versatiles_rs_spark.pages.robots import (
    apply_robots,
    parse_robots,
    parse_robots_text,
)

ROBOTS_A = b"""# site A
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: special-bot
Disallow: /
"""

ROBOTS_B = b"""User-agent: *
Disallow:
"""


def test_parse_groups_and_agent_selection():
    rules = parse_robots_text(ROBOTS_A.decode(), agent="*")
    assert ("disallow", "/private/") in rules
    assert ("allow", "/private/ok/") in rules
    assert ("disallow", "/tmp") in rules
    # exact agent group beats *
    assert parse_robots_text(ROBOTS_A.decode(), agent="special-bot") == [("disallow", "/")]
    # empty Disallow -> no rules (allow all)
    assert parse_robots_text(ROBOTS_B.decode()) == []


def test_apply_robots_longest_prefix_and_ties(spark):
    robots = spark.createDataFrame(
        pd.DataFrame(
            [("a.io", ROBOTS_A), ("b.io", ROBOTS_B)], columns=["host", "robots"]
        )
    )
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "http://a.io/public/x",      # no rule -> allowed
                    "http://a.io/private/secret", # disallow /private/
                    "http://a.io/private/ok/y",   # allow beats shorter disallow
                    "http://a.io/tmpfile",        # prefix /tmp matches
                    "http://b.io/anything",       # empty disallow -> allowed
                    "http://c.io/norobots",       # host without robots -> allowed
                ]
            }
        )
    )
    out = {r["url"]: r["allowed"] for r in apply_robots(pages, rules).collect()}
    assert out["http://a.io/public/x"] is True
    assert out["http://a.io/private/secret"] is False
    assert out["http://a.io/private/ok/y"] is True
    assert out["http://a.io/tmpfile"] is False
    assert out["http://b.io/anything"] is True
    assert out["http://c.io/norobots"] is True
    # exactly one output row per input row
    assert apply_robots(pages, rules).count() == 6


def test_apply_robots_keeps_duplicate_urls(spark):
    robots = spark.createDataFrame(
        pd.DataFrame([("a.io", ROBOTS_A)], columns=["host", "robots"])
    )
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        pd.DataFrame({"url": ["http://a.io/x", "http://a.io/x"]})
    )
    assert apply_robots(pages, rules).count() == 2


def test_apply_robots_zero_pages_shuffle(spark):
    """The winner selection is row-local: no Window, no pages-side
    Exchange — only the tiny rules-side aggregation shuffles."""
    robots = spark.createDataFrame(
        pd.DataFrame([("a.io", ROBOTS_A)], columns=["host", "robots"])
    )
    rules = parse_robots(robots)
    pages = spark.range(100).selectExpr("concat('http://a.io/p/', id) AS url")
    plan = apply_robots(pages, rules)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    import re as _re
    # every Exchange in the plan must be on the (broadcast-input) rules side
    assert not _re.search(r"Exchange hashpartitioning\((url|id|_rid)", plan)


ROBOTS_WILD = b"""User-agent: *
Disallow: /*?sid=
Disallow: /*.pdf$
Allow: /docs/*.pdf$

User-agent: mybot
Disallow: /bot-only/
"""


def test_rfc9309_wildcards_python_path():
    from versatiles_rs_spark.pages.robots import robots_allowed, rule_regex

    rules = parse_robots_text(ROBOTS_WILD.decode(), agent="*")
    # '*' matches any octet sequence anywhere in the value
    assert robots_allowed("/page?sid=123", rules) is False
    assert robots_allowed("/a/b?sid=", rules) is False
    assert robots_allowed("/page?id=123", rules) is True
    # trailing '$' anchors: /x.pdf blocked, /x.pdfs NOT (no longer a match)
    assert robots_allowed("/x.pdf", rules) is False
    assert robots_allowed("/x.pdfs", rules) is True
    # longest VALUE wins: the allow for /docs/*.pdf$ (12 octets) beats
    # the disallow /*.pdf$ (7 octets)
    assert robots_allowed("/docs/x.pdf", rules) is True
    # non-trailing '$' is a literal octet
    assert rule_regex("/a$b") == "^" + __import__("re").escape("/a$b")


def test_user_agent_product_token_prefix():
    # crawler token 'mybot' (from 'MyBot/1.0') matches group 'mybot'
    rules = parse_robots_text(ROBOTS_WILD.decode(), agent="MyBot/1.0")
    assert rules == [("disallow", "/bot-only/")]
    # unrelated agent falls back to the * group
    rules = parse_robots_text(ROBOTS_WILD.decode(), agent="OtherBot/2")
    assert ("disallow", "/*?sid=") in rules


def test_rfc9309_wildcards_spark_path(spark):
    robots = spark.createDataFrame(
        pd.DataFrame([("a.io", ROBOTS_WILD)], columns=["host", "robots"])
    )
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "http://a.io/page?sid=7",   # blocked by /*?sid=
                    "http://a.io/x.pdf",        # blocked by /*.pdf$
                    "http://a.io/x.pdfs",       # $ anchor -> allowed
                    "http://a.io/docs/x.pdf",   # allow override wins
                    "http://a.io/plain",        # no match -> allowed
                ]
            }
        )
    )
    out = {r["url"]: r["allowed"] for r in apply_robots(pages, rules).collect()}
    assert out["http://a.io/page?sid=7"] is False
    assert out["http://a.io/x.pdf"] is False
    assert out["http://a.io/x.pdfs"] is True
    assert out["http://a.io/docs/x.pdf"] is True
    assert out["http://a.io/plain"] is True


def test_spark_python_parity_on_wildcards(spark):
    """apply_robots and robots_allowed agree rule-for-rule on a path set
    exercising '*', '$', ties, and no-match."""
    from versatiles_rs_spark.pages.robots import robots_allowed

    pyrules = parse_robots_text(ROBOTS_WILD.decode(), agent="*")
    paths = [
        "/", "/page?sid=", "/deep/a/b?sid=x", "/x.pdf", "/x.pdfx",
        "/docs/x.pdf", "/docs/sub/x.pdf", "/docs/x.pdfz", "/other",
    ]
    robots = spark.createDataFrame(
        pd.DataFrame([("a.io", ROBOTS_WILD)], columns=["host", "robots"])
    )
    pages = spark.createDataFrame(
        pd.DataFrame({"url": [f"http://a.io{p}" for p in paths]})
    )
    got = {
        r["url"]: r["allowed"]
        for r in apply_robots(pages, parse_robots(robots)).collect()
    }
    for p in paths:
        assert got[f"http://a.io{p}"] == robots_allowed(p, pyrules), p
