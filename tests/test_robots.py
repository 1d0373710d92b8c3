"""RFC 9309 robots parsing + gating (operators/robots.py).

Parser group semantics, LIKE compilation (escaping + wildcards), and
the Spark gate's precedence rules on adversarial minimal cases. The
fixture policy's full oracle (web_robots_gate) is swept with the
driver's own compare in tests/test_extra_queries.py.
"""

import pytest

from rdf_to_text_spark.operators.robots import (
    parse_robots_py,
    robots_gate,
    robots_rules,
    to_like_pattern,
)


def test_parse_groups_and_comments():
    txt = """
# preamble comment
Disallow: /orphan   # rule before any group: dropped
User-agent: a
User-agent: b
Disallow: /x/   # shared by a AND b
Allow: /x/pub
User-agent: c
Disallow:
Sitemap: https://h/s.xml
"""
    rules = parse_robots_py(txt)
    assert ("a", False, "/x/") in rules and ("b", False, "/x/") in rules
    assert ("a", True, "/x/pub") in rules and ("b", True, "/x/pub") in rules
    # empty Disallow matches nothing -> dropped; orphan rule dropped
    assert not [r for r in rules if r[0] == "c"]
    assert not [r for r in rules if "orphan" in r[2]]


def test_parse_agent_case_and_key_case():
    rules = parse_robots_py("USER-AGENT: KgBot\nDISALLOW: /p/")
    assert rules == [("kgbot", False, "/p/")]


@pytest.mark.parametrize(
    "path,pat",
    [
        ("/a/", "/a/%"),            # implicit suffix wildcard
        ("/a/*b", "/a/%b%"),        # * -> %
        ("/a/*b$", "/a/%b"),        # trailing $ anchors (no suffix %)
        ("/100%_x", "/100\\%\\_x%"),  # LIKE metachars escaped
    ],
)
def test_to_like_pattern(path, pat):
    assert to_like_pattern(path) == pat


ROBOTS = """\
User-agent: *
Disallow: /d/
Allow: /d/open
User-agent: kgbot
Disallow: /k/
Allow: /k/
"""


@pytest.fixture()
def rules(spark):
    return robots_rules(
        spark.createDataFrame([("h.example", ROBOTS)], "host string, robots_txt string")
    )


def _gate(spark, rules, agent, paths):
    urls = spark.createDataFrame(
        [(f"https://H.Example{p}",) for p in paths], "url string"
    )
    out = robots_gate(urls, rules, agent)
    return {r["url"]: (r["allowed"], r["rule_path"]) for r in out.collect()}


def test_gate_star_group_precedence(spark, rules):
    got = _gate(spark, rules, "anybot", ["/d/x", "/d/open/y", "/other"])
    assert got["https://H.Example/d/x"] == (False, "/d/")
    # longest match wins: Allow /d/open (7) beats Disallow /d/ (3)
    assert got["https://H.Example/d/open/y"] == (True, "/d/open")
    # no rule matched -> allowed, no rule path
    assert got["https://H.Example/other"] == (True, None)


def test_gate_exact_group_replaces_star(spark, rules):
    got = _gate(spark, rules, "KGBOT", ["/d/x", "/k/x"])
    # kgbot group replaces '*': /d/ rules do NOT apply
    assert got["https://H.Example/d/x"] == (True, None)
    # equal length tie -> Allow wins
    assert got["https://H.Example/k/x"] == (True, "/k/")


def test_gate_unknown_host_allowed(spark, rules):
    urls = spark.createDataFrame([("https://elsewhere.example/d/x",)], "url string")
    row = robots_gate(urls, rules, "anybot").collect()[0]
    assert row["allowed"] is True and row["rule_path"] is None


def test_gate_query_matching_and_root(spark, rules):
    extra = robots_rules(
        spark.createDataFrame(
            [("q.example", "User-agent: *\nDisallow: /*?*\nDisallow: /$")],
            "host string, robots_txt string",
        )
    )
    urls = spark.createDataFrame(
        [
            ("https://q.example/a?x=1",),
            ("https://q.example/a",),
            ("https://q.example",),  # empty path -> '/' and the /$ anchor
        ],
        "url string",
    )
    res = {
        r["url"]: (r["allowed"], r["rule_path"])
        for r in robots_gate(urls, extra, "anybot").collect()
    }
    assert res["https://q.example/a?x=1"] == (False, "/*?*")
    assert res["https://q.example/a"] == (True, None)
    assert res["https://q.example"] == (False, "/$")
