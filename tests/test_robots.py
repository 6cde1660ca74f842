"""robots.txt matching (`functions/robots.py`): RFC 9309 decision
fixtures (longest match, allow tie-break, wildcards, $ anchor, UA
group selection) and the broadcast Spark gate."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.robots import (
    parse_robots,
    robots_allowed,
    robots_gate,
)

_TXT = """
# fixture
User-agent: *
Disallow: /private/
Allow: /private/pub
Disallow: /*.pdf$
Allow: /a
Disallow: /a/b

User-agent: special
User-agent: other-bot
Disallow: /

Sitemap: https://e.org/sitemap.xml
"""


@pytest.mark.parametrize("path,want", [
    ("/public/x", True),          # no rule matches
    ("/private/x", False),        # Disallow /private/
    ("/private/pub9", True),      # longer Allow beats Disallow
    ("/doc.pdf", False),          # wildcard + $ anchor
    ("/doc.pdfx", True),          # $ anchor must not match
    ("/a/x", True),               # Allow /a
    ("/a/b/c", False),            # longer Disallow /a/b
    ("/", True),
])
def test_decisions(path, want):
    assert robots_allowed(_TXT, path) is want


def test_ua_groups():
    # 'special' UA hits the Disallow-everything group; unknown UA
    # falls back to *; the longest UA token wins
    assert robots_allowed(_TXT, "/public/x", ua="SpecialBot/1.0") is False
    assert robots_allowed(_TXT, "/public/x", ua="randombot") is True
    two = (
        "User-agent: bot\nDisallow: /x\n\n"
        "User-agent: bot-wide\nDisallow: /\n"
    )
    # UA 'bot-wide/2' contains both tokens; 'bot-wide' is longer
    assert robots_allowed(two, "/y", ua="bot-wide/2") is False
    assert robots_allowed(two, "/y", ua="mybot/2") is True


def test_parse_structure():
    p = parse_robots(_TXT)
    assert p["sitemaps"] == ["https://e.org/sitemap.xml"]
    assert len(p["groups"]) == 2
    uas, rules = p["groups"][1]
    assert uas == ["special", "other-bot"]
    assert [(k, v) for k, v, _, _ in rules] == [("disallow", "/")]


def test_allow_tie_and_empty_disallow():
    txt = "User-agent: *\nAllow: /dir\nDisallow: /dir\n"
    assert robots_allowed(txt, "/dir/x") is True  # tie → allow
    assert robots_allowed("User-agent: *\nDisallow:\n", "/any") is True


def test_spark_gate(spark):
    df = spark.createDataFrame(
        [(0, "/public/1"), (1, "/private/1"), (2, "/private/pub1"),
         (3, "/x.pdf"), (4, None)],
        "doc_id long, path string",
    )
    got = {r["doc_id"]: r["allowed"]
           for r in robots_gate(df, _TXT).collect()}
    assert got == {0: True, 1: False, 2: True, 3: False, 4: None}


def test_split_groups_merge():
    # RFC 9309 §2.2.2: two '*' groups are ONE logical group — rules
    # from both must apply (review finding r12)
    txt = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    assert robots_allowed(txt, "/a/x") is False
    assert robots_allowed(txt, "/b/x") is False   # second * group
    assert robots_allowed(txt, "/g/x") is True    # not our group
    assert robots_allowed(txt, "/g/x", ua="googlebot") is False
    # duplicate named-UA groups merge too
    dup = (
        "User-agent: bot\nDisallow: /x\n\n"
        "User-agent: bot\nDisallow: /y\n"
    )
    assert robots_allowed(dup, "/y/1", ua="bot/1.2") is False


def test_ua_product_token_matching():
    # ADVICE r12: RFC 9309 §2.2.1 matches the PRODUCT TOKEN, not an
    # arbitrary substring of the UA string
    txt = "User-agent: bot\nDisallow: /\n"
    # 'bot' buried mid-token must NOT capture the group
    assert robots_allowed(txt, "/x", ua="robotstxt-audit/1.0") is True
    assert robots_allowed(txt, "/x", ua="mybot") is True
    # equality and prefix-of-product DO match
    assert robots_allowed(txt, "/x", ua="bot") is False
    assert robots_allowed(txt, "/x", ua="Bot/2.0") is False
    assert robots_allowed(txt, "/x", ua="botify/3") is False
    # multi-product UA: any product token can match
    assert robots_allowed(txt, "/x", ua="Mozilla/5.0 bot/1.1") is False
    g = "User-agent: googlebot\nDisallow: /g\n"
    assert robots_allowed(g, "/g/x", ua="googlebot-news/1.0") is False


def test_crawl_delay_and_sitemaps():
    from metrics_advisor_spark.functions.robots import (
        crawl_delay,
        robots_sitemaps,
    )

    txt = """
Sitemap: https://example.org/sitemap-a.xml
User-agent: *
Crawl-delay: 1
Disallow: /x

User-agent: fastbot
Disallow: /y

User-agent: slowbot
Crawl-delay: 10.5
Disallow: /z

User-agent: slowbot
Crawl-delay: 3
Sitemap: https://example.org/sitemap-b.xml
"""
    # sitemaps collect file-wide regardless of position
    assert robots_sitemaps(txt) == [
        "https://example.org/sitemap-a.xml",
        "https://example.org/sitemap-b.xml",
    ]
    # UA-specific group wins over *, max across split groups
    assert crawl_delay(txt, "slowbot/2.0") == 10.5
    # matching group declares no delay: None, not the * fallback
    assert crawl_delay(txt, "fastbot") is None
    # * fallback for unknown agents
    assert crawl_delay(txt, "otherbot") == 1.0
    # malformed value ignored
    assert crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert crawl_delay("User-agent: *\nDisallow: /a\n") is None
