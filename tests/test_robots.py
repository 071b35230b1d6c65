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
