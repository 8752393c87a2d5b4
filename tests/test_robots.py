"""robots.txt parse + REP longest-prefix matching (web.parse_robots /
web.robots_allowed) against hand-derived RFC 9309 semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark import web as W

BODY_A = """# policy
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: gsbot
Disallow: /g
"""

BODY_B = """User-agent: a
User-agent: b
DISALLOW: /x
Disallow:
garbage line no colon
"""

BODY_C = """User-agent: *
Disallow: /
"""


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(
        [("a.example", BODY_A), ("b.example", BODY_B), ("c.example", BODY_C)],
        "host string, body string",
    )
    return W.parse_robots(df).cache()


def _allowed(spark, rules, url, agent="*"):
    u = spark.createDataFrame([(url,)], "url string")
    [r] = W.robots_allowed(u, rules, agent=agent).collect()
    return r["allowed"]


def test_parse_rules_shape(rules):
    rows = {(r["host"], r["agent"], r["allow"], r["prefix"])
            for r in rules.collect()}
    assert rows == {
        ("a.example", "*", False, "/private"),
        ("a.example", "*", True, "/private/ok"),
        ("a.example", "gsbot", False, "/g"),
        ("b.example", "a", False, "/x"),
        ("b.example", "b", False, "/x"),
        ("c.example", "*", False, "/"),
    }


def test_longest_match_wins(spark, rules):
    assert _allowed(spark, rules, "https://a.example/private/x") is False
    assert _allowed(spark, rules, "https://a.example/private/ok/y") is True
    assert _allowed(spark, rules, "https://a.example/pub") is True
    assert _allowed(spark, rules, "https://a.example/") is True


def test_specific_agent_group_excludes_star(spark, rules):
    # a.example HAS a gsbot group → only it applies to gsbot
    assert _allowed(spark, rules, "https://a.example/g/x", agent="gsbot") is False
    assert _allowed(spark, rules, "https://a.example/private/x", agent="gsbot") is True
    # c.example has no gsbot group → falls back to *
    assert _allowed(spark, rules, "https://c.example/anything", agent="gsbot") is False


def test_shared_group_and_empty_disallow(spark, rules):
    assert _allowed(spark, rules, "https://b.example/x/1", agent="a") is False
    assert _allowed(spark, rules, "https://b.example/x/1", agent="b") is False
    assert _allowed(spark, rules, "https://b.example/y", agent="a") is True


def test_unknown_host_defaults_allowed(spark, rules):
    assert _allowed(spark, rules, "https://nowhere.example/q") is True


def test_root_path_defaults_to_slash(spark, rules):
    # an empty path is the root fetch → matches a '/' disallow
    assert _allowed(spark, rules, "https://c.example") is False
    assert _allowed(spark, rules, "https://c.example/") is False
