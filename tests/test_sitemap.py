"""Sitemap ingestion (`functions/sitemap.py`): protocol parse
(urlset/sitemapindex, namespaces, entities, CDATA, missing-loc drop),
the rejection matrix, and the frontier admission chain end-to-end."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.sitemap import (
    parse_sitemap,
    sitemap_entries,
    sitemap_frontier,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc>https://e.org/a?x=1&amp;y=2</loc>
   <lastmod>2026-01-03</lastmod>
   <changefreq>daily</changefreq><priority>0.8</priority></url>
 <url><loc><![CDATA[https://e.org/b]]></loc></url>
 <url><lastmod>2026-01-01</lastmod></url>
 <unknown>ignored</unknown>
</urlset>"""


def test_urlset_parse():
    got = parse_sitemap(_URLSET)
    assert len(got) == 2  # loc-less entry dropped per protocol
    assert got[0] == {
        "kind": "url", "loc": "https://e.org/a?x=1&y=2",
        "lastmod": "2026-01-03", "changefreq": "daily",
        "priority": 0.8,
    }
    assert got[1]["loc"] == "https://e.org/b"
    assert got[1]["priority"] is None


def test_index_parse_and_namespace_agnosticism():
    idx = (
        "<sitemapindex><sitemap><loc>https://e.org/s1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://e.org/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    got = parse_sitemap(idx)  # no namespace: generators omit it
    assert [e["kind"] for e in got] == ["sitemap", "sitemap"]
    assert got[0]["lastmod"] == "2026-02-01"
    # namespaced index parses identically
    ns = idx.replace(
        "<sitemapindex>",
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
        'sitemap/0.9">',
    )
    assert parse_sitemap(ns) == got


def test_rejections():
    with pytest.raises(ValueError, match="malformed XML"):
        parse_sitemap("<urlset><url></urlset>")
    with pytest.raises(ValueError, match="unexpected root"):
        parse_sitemap("<rss></rss>")
    with pytest.raises(ValueError, match="non-numeric priority"):
        parse_sitemap(
            "<urlset><url><loc>x</loc>"
            "<priority>high</priority></url></urlset>"
        )


_ROBOTS = "User-agent: *\nDisallow: /private/\nAllow: /private/pub\n"


def test_frontier_admission(spark):
    df = spark.createDataFrame(
        [
            (1, "<urlset>"
                "<url><loc>HTTP://E.org:80/ok?utm_source=s&amp;q=1"
                "</loc></url>"
                "<url><loc>http://e.org/private/x</loc></url>"
                "<url><loc>http://e.org/private/pub1</loc></url>"
                "<url><loc>http://e.org/dup</loc></url>"
                "</urlset>"),
            (2, "<sitemapindex><sitemap>"
                "<loc>http://e.org/private/map.xml</loc>"
                "</sitemap></sitemapindex>"),
        ],
        "doc_id long, sitemap string",
    )
    known = spark.createDataFrame(
        [("http://e.org/dup",)], "canonical string"
    )
    rows = {
        r["canonical"]: r
        for r in sitemap_frontier(
            sitemap_entries(df), _ROBOTS, known
        ).collect()
    }
    ok = rows["http://e.org/ok?q=1"]  # canonicalized + utm stripped
    assert (ok["allowed"], ok["known"], ok["admitted"]) == (
        True, False, True,
    )
    assert rows["http://e.org/private/x"]["admitted"] is False
    assert rows["http://e.org/private/x"]["allowed"] is False
    assert rows["http://e.org/private/pub1"]["admitted"] is True
    dup = rows["http://e.org/dup"]
    assert (dup["allowed"], dup["known"], dup["admitted"]) == (
        True, True, False,
    )
    # index entries: robots applies, but they never enter the frontier
    m = rows["http://e.org/private/map.xml"]
    assert (m["kind"], m["allowed"], m["admitted"]) == (
        "sitemap", False, False,
    )


def test_quarantine_mode(spark):
    df = spark.createDataFrame(
        [
            (1, "<urlset><url><loc>http://e.org/a</loc></url></urlset>"),
            (2, "<urlset><url></urlset>"),        # malformed XML
            (3, "<rss></rss>"),                    # wrong root
        ],
        "doc_id long, sitemap string",
    )
    rows = sitemap_entries(df, strict=False).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[1]["loc"] == "http://e.org/a"
    assert by_doc[1]["error"] is None
    assert by_doc[2]["loc"] is None
    assert "malformed XML" in by_doc[2]["error"]
    assert "unexpected root" in by_doc[3]["error"]
    # strict mode still raises
    import pytest as _pytest
    with _pytest.raises(Exception):
        sitemap_entries(df).collect()
