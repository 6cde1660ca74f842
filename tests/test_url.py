"""URL canonicalization (`functions/url.py`): RFC 3986 normalization
fixtures, crawl-dedup conventions (query sort, tracking strip), and
the canonical-key dup-group pass."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.url import (
    canonical_urls,
    canonicalize_url,
    url_dup_groups,
)


@pytest.mark.parametrize("raw,want", [
    # case + default port
    ("HTTP://Example.ORG:80/a", "http://example.org/a"),
    ("https://EXAMPLE.org:443/", "https://example.org/"),
    ("https://example.org:8443/x", "https://example.org:8443/x"),
    # dot segments
    ("http://e.org/a/./b/../c", "http://e.org/a/c"),
    ("http://e.org/a/..", "http://e.org/"),
    ("http://e.org/a/b/../../c/", "http://e.org/c/"),
    # empty path
    ("http://e.org", "http://e.org/"),
    ("http://e.org?q=1", "http://e.org/?q=1"),
    # percent normalization: unreserved decodes, rest uppercases
    ("http://e.org/%7euser%2d/%2fx", "http://e.org/~user-/%2Fx"),
    # query sort (by key then value) + fragment drop
    ("http://e.org/p?z=1&a=2&a=1#frag", "http://e.org/p?a=1&a=2&z=1"),
    # valueless keys keep their form
    ("http://e.org/p?flag&a=1", "http://e.org/p?a=1&flag"),
    # userinfo and non-http scheme survive
    ("FTP://User@E.org/f", "ftp://User@e.org/f"),
])
def test_canonical_fixtures(raw, want):
    assert canonicalize_url(raw) == want


def test_tracking_strip():
    u = "http://e.org/p?utm_source=x&utm_campaign=y&id=3&gclid=z&fbclid=q"
    assert canonicalize_url(u, strip_tracking=True) == \
        "http://e.org/p?id=3"
    # off by default
    assert "utm_source" in canonicalize_url(u)


def test_idempotent():
    urls = [
        "HTTP://Example.ORG:80/a/./b/../c?z=1&a=2#f",
        "https://e.org/%7ex?utm_source=s&b=2",
    ]
    for u in urls:
        c1 = canonicalize_url(u, strip_tracking=True)
        assert canonicalize_url(c1, strip_tracking=True) == c1


def test_relative_dot_segments():
    # ADVICE r12: relative '..' must resolve against earlier segments
    # (RFC 3986 merge semantics), and UNRESOLVABLE leading '..' must
    # survive — dropping it collided 'a/../b' and 'a/b' dedup keys
    assert canonicalize_url("a/../b") == "b"
    assert canonicalize_url("a/b/../c") == "a/c"
    assert canonicalize_url("../a") == "../a"
    assert canonicalize_url("../../a/b") == "../../a/b"
    assert canonicalize_url("a/../../b") == "../b"
    assert canonicalize_url("a/./b/..") == "a/"  # trailing '..' ⇒ dir
    # absolute paths still protect the root; leading '..' is dropped
    assert canonicalize_url("/../a") == "/a"
    assert canonicalize_url("/a/../b") == "/b"
    assert canonicalize_url("http://e.org/a/../b") == "http://e.org/b"
    # idempotent under re-canonicalization
    for u in ("a/../b", "../a", "a/../../b", "/../a"):
        c1 = canonicalize_url(u)
        assert canonicalize_url(c1) == c1


def test_lenient_inputs():
    # relative / schemeless / junk come back normalized, never raise
    assert canonicalize_url("/a/./b") == "/a/b"
    assert canonicalize_url("  http://e.org/x  ") == "http://e.org/x"
    assert canonicalize_url("") == ""
    # raw spaces are not %XX escapes, so they pass through untouched
    assert canonicalize_url("not a url") == "not a url"
    canonicalize_url("http://[bad")  # malformed IPv6 — no raise
    canonicalize_url("????")


def test_spark_dup_groups(spark):
    rows = [
        (1, "HTTP://E.org:80/a?x=1&utm_source=s"),
        (2, "http://e.org/a?x=1"),
        (3, "http://e.org/b/../a?x=1#frag"),
        (4, "http://e.org/other"),
        (5, "https://e.org/a?x=1"),  # different scheme — NOT a dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["canonical"]: (r["n_docs"], r["min_doc_id"])
           for r in url_dup_groups(df).collect()}
    assert got == {"http://e.org/a?x=1": (3, 1)}
    # column form round-trips nulls
    withc = canonical_urls(
        spark.createDataFrame([(None,)], "url string")
    ).collect()
    assert withc[0]["canonical"] is None


def test_no_authority_idempotent():
    # review finding r12: 'http:foo' must NOT grow a fabricated '//'
    # (which would promote the path to a host and break idempotence)
    for u in ("http:foo", "http:", "mailto:a@b.example"):
        c1 = canonicalize_url(u)
        assert canonicalize_url(c1) == c1
    assert canonicalize_url("http:foo") == "http:foo"


def test_resolve_reference_rfc_examples():
    # the COMPLETE published example set: RFC 3986 §5.4.1 (normal) and
    # §5.4.2 (abnormal, incl. strict-mode 'http:g'), base §5.4
    from metrics_advisor_spark.functions.url import resolve_reference

    base = "http://a/b/c/d;p?q"
    cases = {
        "g:h": "g:h", "g": "http://a/b/c/g", "./g": "http://a/b/c/g",
        "g/": "http://a/b/c/g/", "/g": "http://a/g", "//g": "http://g",
        "?y": "http://a/b/c/d;p?y", "g?y": "http://a/b/c/g?y",
        "#s": "http://a/b/c/d;p?q#s", "g#s": "http://a/b/c/g#s",
        "g?y#s": "http://a/b/c/g?y#s", ";x": "http://a/b/c/;x",
        "g;x": "http://a/b/c/g;x", "g;x?y#s": "http://a/b/c/g;x?y#s",
        "": "http://a/b/c/d;p?q", ".": "http://a/b/c/",
        "./": "http://a/b/c/", "..": "http://a/b/", "../": "http://a/b/",
        "../g": "http://a/b/g", "../..": "http://a/",
        "../../": "http://a/", "../../g": "http://a/g",
        "../../../g": "http://a/g", "../../../../g": "http://a/g",
        "/./g": "http://a/g", "/../g": "http://a/g",
        "g.": "http://a/b/c/g.", ".g": "http://a/b/c/.g",
        "g..": "http://a/b/c/g..", "..g": "http://a/b/c/..g",
        "./../g": "http://a/b/g", "./g/.": "http://a/b/c/g/",
        "g/./h": "http://a/b/c/g/h", "g/../h": "http://a/b/c/h",
        "g;x=1/./y": "http://a/b/c/g;x=1/y",
        "g;x=1/../y": "http://a/b/c/y",
        "http:g": "http:g",
    }
    for ref, want in cases.items():
        assert resolve_reference(base, ref) == want, ref


def test_resolve_reference_edges():
    from metrics_advisor_spark.functions.url import resolve_reference

    # authority-with-empty-path base merges onto '/'
    assert resolve_reference("http://h", "x/y") == "http://h/x/y"
    # protocol-relative keeps ref authority, takes base scheme
    assert resolve_reference("https://a/b", "//cdn/z") == "https://cdn/z"
    # empty ref keeps the base query; '?y' replaces it
    assert resolve_reference("http://h/p?q=1", "") == "http://h/p?q=1"
    assert resolve_reference("http://h/p?q=1", "?y") == "http://h/p?y"
    # malformed ref authority: leniency, ref returned untouched
    bad = "http://[::bad/x"
    assert resolve_reference("http://h/p", bad) == bad
    # composes with canonicalization into the frontier key
    got = canonicalize_url(
        resolve_reference("HTTP://H/a/b/page", "../up?b=2&a=1#frag")
    )
    assert got == "http://h/a/up?a=1&b=2"


def test_frontier_schedule(spark):
    from metrics_advisor_spark.functions.url import frontier_schedule

    urls = [
        ("https://a.example/p1",), ("https://a.example/p2",),
        ("https://a.example/p3",), ("https://b.example/q1",),
        ("https://b.example/q2",), ("https://c.example/r1",),
    ]
    df = spark.createDataFrame(urls, "canonical string")
    delays = spark.createDataFrame(
        [("a.example", 10.0), ("b.example", 0.5)],
        "host string, delay_sec double",
    )
    got = {
        r["canonical"]: (r["host"], r["wave"], r["fetch_offset_sec"])
        for r in frontier_schedule(df, delays=delays).collect()
    }
    # per-host FIFO waves in url order, spaced by the host's delay
    assert got["https://a.example/p1"] == ("a.example", 0, 0.0)
    assert got["https://a.example/p2"] == ("a.example", 1, 10.0)
    assert got["https://a.example/p3"] == ("a.example", 2, 20.0)
    assert got["https://b.example/q2"] == ("b.example", 1, 0.5)
    # host without a delay entry: the default applies
    assert got["https://c.example/r1"] == ("c.example", 0, 0.0)
    two = frontier_schedule(
        spark.createDataFrame(
            [("https://c.example/r1",), ("https://c.example/r2",)],
            "canonical string",
        ),
        default_delay=2.0,
    ).collect()
    assert {r["fetch_offset_sec"] for r in two} == {0.0, 2.0}
