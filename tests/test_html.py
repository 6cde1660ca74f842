"""HTML → text extraction (`functions/html.py`): rendering-rule
fixtures (block/inline boundaries, dropped elements, entities incl.
numeric + cp1252 remap), leniency on broken markup, and JVM-chain ==
Python-pipeline agreement on the shared feature set."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.html import (
    extract_text,
    html_to_text,
)


def test_basic_blocks_and_inline():
    html = (
        "<html><head><title>T</title></head><body>"
        "<h1>Head</h1><p>one <b>two</b> three</p>"
        "<div>four</div>five<br>six</body></html>"
    )
    # title is inline-stripped (head isn't a drop element), blocks
    # break lines, inline tags vanish without eating word boundaries
    assert html_to_text(html) == "T\nHead\none two three\nfour\nfive\nsix"


def test_script_style_dropped_whole():
    html = (
        "<p>keep</p><script>var x = '<p>not text</p>';</script>"
        "<style>p { color: red }</style><p>also keep</p>"
        "<noscript>enable js</noscript>"
    )
    assert html_to_text(html) == "keep\nalso keep"


def test_comments_and_cdata():
    html = "a<!-- hidden <p>x</p> -->b<![CDATA[ <raw> ]]>c"
    assert html_to_text(html) == "a b c"


def test_entities():
    assert html_to_text("Tom &amp; Jerry &lt;3 &quot;q&quot;") == \
        'Tom & Jerry <3 "q"'
    assert html_to_text("caf&eacute; &ndash; 5&deg;") == "café – 5°"
    # numeric decimal, hex, cp1252 remap (0x92 = right single quote),
    # out-of-range → replacement char
    assert html_to_text("&#65;&#x42;&#146;&#x110000;") == "AB’�"
    # unknown named entity stays literal (lenient)
    assert html_to_text("&bogus; &amp;") == "&bogus; &"


def test_nbsp_and_whitespace_collapse():
    html = "<p>a&nbsp;&nbsp;b</p>\n\n   <p>  c\t d  </p>"
    assert html_to_text(html) == "a b\nc d"


def test_lenient_on_broken_markup():
    # unclosed tags, stray '<', attribute junk — never raises, text
    # survives
    html = "<p>5 < 6 and <em broken>text<p>next"
    assert html_to_text(html) == "5 < 6 and text\nnext"
    assert html_to_text("") == ""
    assert html_to_text("<div><div><div>deep") == "deep"


def test_attributes_do_not_leak():
    html = '<a href="https://x.example/?q=<b>">link</a>'
    assert html_to_text(html) == "link"


@pytest.mark.parametrize("jvm", [False, True])
def test_spark_extraction(spark, jvm):
    rows = [
        (0, "<html><body>alpha beta</body></html>"),
        (1, "<p>one</p><p>two &amp; three</p>"),
        (2, "<script>x</script>plain"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: r["text"]
        for r in extract_text(df, jvm=jvm).collect()
    }
    assert got[0] == "alpha beta"
    assert got[1] == "one\ntwo & three"
    assert got[2] == "plain"
    assert got[3] is None


def test_jvm_chain_matches_python_on_shared_features(spark):
    fixtures = [
        "<h1>A</h1><p>b <i>c</i></p>",
        "x<!-- c -->y<style>s</style>z",
        "Tom &amp; Jerry&nbsp;&hellip; <br> done",
        "<div>  spaced   out  </div>",
        "broken < markup <p>ok</p>",
    ]
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fixtures)],
        "doc_id long, html string",
    )
    a = {r["doc_id"]: r["text"]
         for r in extract_text(df, jvm=True).collect()}
    for i, f in enumerate(fixtures):
        assert a[i] == html_to_text(f), f


def test_charset_sniffing():
    from metrics_advisor_spark.functions.html import (
        decode_html_bytes,
        sniff_charset,
    )

    # BOM beats everything
    assert sniff_charset(b"\xef\xbb\xbfhello", "text/html; charset=latin-1") \
        == "utf-8-sig"
    # .encode("utf-16") emits a BOM (utf-16-le alone does not)
    assert sniff_charset("héllo".encode("utf-16"),
                         None).startswith("utf-16")
    # Content-Type param beats meta
    body = b'<meta charset="koi8-r"><p>x</p>'
    assert sniff_charset(body, "text/html; charset=ISO-8859-2") \
        == "iso-8859-2"
    assert sniff_charset(body, "text/html") == "koi8-r"
    # http-equiv style meta
    he = (b'<meta http-equiv="Content-Type" '
          b'content="text/html; charset=Shift_JIS">')
    assert sniff_charset(he, None) == "shift_jis"
    # meta beyond the first 1024 bytes is ignored
    far = b" " * 1100 + b'<meta charset="koi8-r">'
    assert sniff_charset(far, None) == "utf-8"

    # decode: declared wins when it works
    t, enc = decode_html_bytes("café".encode("iso-8859-1"),
                               "text/html; charset=iso-8859-1")
    assert (t, enc) == ("café", "iso-8859-1")
    # bogus declaration → utf-8 → works
    t, enc = decode_html_bytes("café".encode(),
                               "text/html; charset=not-a-charset")
    assert (t, enc) == ("café", "utf-8")
    # declared utf-8 but bytes are latin-1 → windows-1252 fallback
    t, enc = decode_html_bytes("café".encode("latin-1"), None)
    assert enc == "windows-1252" and t == "café"
    # the fallback is total: any byte soup decodes
    t, enc = decode_html_bytes(bytes(range(256)), None)
    assert enc == "windows-1252" and len(t) == 256


def test_extract_text_from_bytes(spark):
    from metrics_advisor_spark.functions.html import (
        extract_text_from_bytes,
    )

    rows = [
        (0, bytearray("<p>café</p>".encode("utf-8")),
         "text/html; charset=utf-8"),
        (1, bytearray("<p>café</p>".encode("iso-8859-1")),
         "text/html; charset=iso-8859-1"),
        (2, bytearray("<p>café</p>".encode("latin-1")),
         None),  # undeclared latin-1 → cp1252 fallback
        (3, None, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, body binary, ct string"
    )
    got = {
        r["doc_id"]: (r["text"], r["encoding"])
        for r in extract_text_from_bytes(
            df, content_type_col="ct"
        ).collect()
    }
    assert got[0] == ("café", "utf-8")
    assert got[1] == ("café", "iso-8859-1")
    assert got[2] == ("café", "windows-1252")
    assert got[3] == (None, None)


def test_amp_entity_decodes_once_both_paths(spark):
    # review finding r12: '&amp;lt;' is the ESCAPED text '&lt;' and
    # must decode exactly once — a sequential chain that replaces
    # &amp; first double-decodes it to '<'
    fixtures = ["a &amp;lt; b", "&amp;amp; &amp;nbsp;", "x &amp; &lt; y"]
    assert html_to_text(fixtures[0]) == "a &lt; b"
    assert html_to_text(fixtures[1]) == "&amp; &nbsp;"
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fixtures)],
        "doc_id long, html string",
    )
    got = {r["doc_id"]: r["text"]
           for r in extract_text(df, jvm=True).collect()}
    for i, f in enumerate(fixtures):
        assert got[i] == html_to_text(f), f


def test_utf16_bom_not_in_output():
    # review finding r12: the -le/-be codecs keep the BOM as ZWNBSP
    from metrics_advisor_spark.functions.html import decode_html_bytes

    body = "<p>hi</p>".encode("utf-16")  # BOM-prefixed
    text, enc = decode_html_bytes(body, None)
    assert enc.startswith("utf-16")
    assert not text.startswith("\ufeff")
    assert text == "<p>hi</p>"


def test_extract_links():
    from metrics_advisor_spark.functions.html import extract_links

    html = (
        '<html><body><A HREF="g1.html">a</A>'
        '<a href="../up/x?b=2&amp;a=1">b</a>'
        "<a href='/abs'>c</a>"
        "<a rel=nofollow href=plain.html>d</a>"
        '<a href="mailto:x@y.example">e</a>'
        '<a href="javascript:void(0)">f</a>'
        '<a href="#top">g</a>'
        "<a name=anchor-without-href>h</a></body></html>"
    )
    base = "https://example.org/s/dir/page.html"
    got = extract_links(html, base)
    # positions count every extracted anchor; mailto/js filtered
    assert got == [
        (0, "g1.html", "https://example.org/s/dir/g1.html"),
        (1, "../up/x?b=2&a=1", "https://example.org/s/up/x?b=2&a=1"),
        (2, "/abs", "https://example.org/abs"),
        (3, "plain.html", "https://example.org/s/dir/plain.html"),
        (6, "#top", "https://example.org/s/dir/page.html#top"),
    ]
    # unfiltered keeps every anchor
    assert len(extract_links(html, base, fetchable_only=False)) == 7
    # <base href> re-roots resolution (itself resolved against base)
    rebased = '<base href="../rb/">' + html
    assert extract_links(rebased, base)[0] == (
        0, "g1.html", "https://example.org/s/rb/g1.html",
    )
    # no base at all: hrefs come back unresolved, http(s) only
    loose = extract_links(html, None)
    assert loose == []
    absd = extract_links(
        '<a href="https://k.example/z">k</a>', None,
    )
    assert absd == [(0, "https://k.example/z", "https://k.example/z")]


def test_html_links_spark(spark):
    from metrics_advisor_spark.functions.html import html_links

    rows = [
        (1, "https://example.org/d/p.html",
         '<a href="x.html">x</a><a href="?b=2&amp;a=1">q</a>'),
        (2, "https://example.org/d/p.html", None),
        (3, "https://example.org/d/p.html", "<p>no links</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = sorted(
        (r["doc_id"], r["link_pos"], r["resolved"], r["canonical"])
        for r in html_links(df).collect()
    )
    assert got == [
        (1, 0, "https://example.org/d/x.html", "https://example.org/d/x.html"),
        (1, 1, "https://example.org/d/p.html?b=2&a=1",
         "https://example.org/d/p.html?a=1&b=2"),
    ]


def test_extract_links_data_href_not_matched():
    # review finding r13: '[^>]*?href' matched inside 'data-href'
    from metrics_advisor_spark.functions.html import extract_links

    html = (
        '<a data-href="/fake">no real href</a>'
        '<a data-href="/fake" href="/real">both</a>'
        '<base data-href="/nope"><a href="rel.html">r</a>'
    )
    got = extract_links(html, "https://example.org/d/p.html")
    # the data-href-only anchor is not an href-carrying anchor at all,
    # so positions start at the first REAL href
    assert got == [
        (0, "/real", "https://example.org/real"),
        (1, "rel.html", "https://example.org/d/rel.html"),
    ]


def test_extract_html_meta():
    from metrics_advisor_spark.functions.html import extract_html_meta

    html = (
        "<html><head><title>\n  A &amp; B — guide  </title>"
        '<meta charset="utf-8">'
        "<meta name='description' content='Line one&#10;  two'>"
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="canonical" href="../canon?b=2&amp;a=1">'
        "</head><body>text</body></html>"
    )
    t, d, h = extract_html_meta(html, "https://example.org/x/y/page")
    assert t == "A & B — guide"
    assert d == "Line one two"
    # resolved against the page URL, canonicalized (query sorted)
    assert h == "https://example.org/x/canon?a=1&b=2"
    # rel token list ("alternate canonical") still matches; absence -> None
    html2 = '<link rel="alternate canonical" href="/c">page'
    assert extract_html_meta(html2, "https://example.org/d/p")[2] == \
        "https://example.org/c"
    assert extract_html_meta("<p>plain</p>", None) == (None, None, None)
    # empty title collapses to None
    assert extract_html_meta("<title>  </title>", None)[0] is None


def test_html_meta_spark(spark):
    from metrics_advisor_spark.functions.html import html_meta

    rows = [
        (1, "https://example.org/a/p",
         '<title>T1</title><link rel=canonical href="/a/">'),
        (2, "https://example.org/b/p", None),
        (3, "https://example.org/c/p", "<p>no meta</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = {r["doc_id"]: (r["title"], r["canonical_hint"])
           for r in html_meta(df).collect()}
    assert got[1] == ("T1", "https://example.org/a/")
    assert got[2] == (None, None)
    assert got[3] == (None, None)
