"""HTML → text extraction — the step every crawl pipeline runs right
after WARC/HTTP ingestion, before any text-quality or dedup operator
sees the document.

Scope follows what production extractors (boilerplate-light, lenient)
actually do, built from public knowledge only:
  - drop <script>/<style>/<noscript>/<template> ELEMENTS whole (their
    text content is code, not prose), plus comments and CDATA
  - block-level tags (p, div, br, li, tr, headings, …) become
    newlines, inline tags (a, b, span, …) vanish — so word
    boundaries survive tag removal
  - character references decode: the HTML5 named set's common core
    (amp/lt/gt/quot/apos/nbsp + typographic), and numeric `&#123;` /
    `&#x1f;` forms including the Windows-1252 remap range the spec
    mandates for 0x80-0x9F
  - whitespace normalizes per HTML rendering rules: runs of
    spaces/tabs/newlines inside a block collapse to one space,
    block boundaries to one newline, document trimmed

UNLIKE the binary codecs, extraction is deliberately LENIENT:
crawl HTML is broken by nature (unclosed tags, stray `<`, bad
nesting), and a pipeline that raised on malformed markup would
discard most of the web.  Lenient never means guessing bytes — it
means the tokenizer treats anything that is not a well-formed tag as
text.

Pure regex/str pipeline on the executor (no external parser lib);
runs inside the existing mapInPandas/withColumn shapes.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# attribute run inside a tag: quoted values may contain < and >
# (browsers allow it; `<a href="?q=<b>">` is one tag)
_ATTRS = "(?:\"[^\"]*\"|'[^']*'|[^<>\"'])*"

# elements whose CONTENT is dropped entirely
_DROP = ("script", "style", "noscript", "template")
_DROP_RE = re.compile(
    r"<(" + "|".join(_DROP) + r")\b" + _ATTRS + r">.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_CDATA_RE = re.compile(r"<!\[CDATA\[.*?\]\]>", re.DOTALL)

# tags that imply a line/block boundary when rendered
_BLOCK = (
    "p|div|br|hr|li|ul|ol|tr|td|th|table|h1|h2|h3|h4|h5|h6|"
    "section|article|header|footer|blockquote|pre|form|dl|dt|dd"
)
_BLOCK_RE = re.compile(
    r"</?(?:" + _BLOCK + r")\b" + _ATTRS + r">", re.IGNORECASE
)
# any remaining well-formed tag (inline) — a lone '<' that never
# closes is NOT a tag and stays as text (lenient rule)
_TAG_RE = re.compile(r"</?[a-zA-Z]" + _ATTRS + r">")

_NAMED = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "ndash": "–", "mdash": "—",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“",
    "rdquo": "”", "hellip": "…", "copy": "©",
    "reg": "®", "trade": "™", "deg": "°",
    "middot": "·", "laquo": "«", "raquo": "»",
    "times": "×", "shy": "­", "eacute": "é",
    "egrave": "è", "agrave": "à", "ccedil": "ç",
    "uuml": "ü", "ouml": "ö", "auml": "ä",
    "szlig": "ß", "ntilde": "ñ",
}
_ENT_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")

# HTML5 §13.2.5.80: numeric references in 0x80–0x9F decode via
# Windows-1252, not as C1 controls
_CP1252 = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}


def _decode_entity(m: re.Match) -> str:
    ref = m.group(1)
    if ref[0] == "#":
        try:
            cp = (int(ref[2:], 16) if ref[1] in "xX"
                  else int(ref[1:]))
        except ValueError:
            return m.group(0)
        if cp in _CP1252:
            return _CP1252[cp]
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return "�"
    return _NAMED.get(ref, m.group(0))  # unknown names stay literal


def html_to_text(html: str) -> str:
    """Plain text from an HTML document per the rules above."""
    s = _COMMENT_RE.sub(" ", html)
    s = _CDATA_RE.sub(" ", s)
    s = _DROP_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _ENT_RE.sub(_decode_entity, s)
    s = s.replace(" ", " ")  # nbsp renders as space
    # per-block horizontal collapse, then block-boundary collapse
    s = re.sub(r"[ \t\r\f\v]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{2,}", "\n", s)
    return s.strip()


def html_text_col(col: Column) -> Column:
    """The same pipeline as a Catalyst expression chain — stays
    JVM-side (no Python worker) for the common case where per-row
    regex replacement is the whole job.  Functionally equal to
    `html_to_text` for the supported entity set; property-tested
    against the Python form."""
    s = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?s)<!\[CDATA\[.*?\]\]>", " ")
    s = F.regexp_replace(
        s,
        r"(?is)<(script|style|noscript|template)\b" + _ATTRS + r">"
        r".*?</\1\s*>",
        " ",
    )
    s = F.regexp_replace(
        s, r"(?i)</?(?:" + _BLOCK + r")\b" + _ATTRS + r">", "\n"
    )
    s = F.regexp_replace(s, r"</?[a-zA-Z]" + _ATTRS + r">", "")
    # named entities: one replace per table entry (constant-folded
    # chain; the set is small and closed).  ORDER MATTERS in a
    # sequential chain: '&amp;' must decode LAST, otherwise
    # '&amp;lt;' first becomes '&lt;' and the later &lt; pass
    # double-decodes it to '<' (html_to_text's single-pass sub
    # cannot make that mistake; test-pinned equality)
    for name, ch in _NAMED.items():
        if name != "amp":
            s = F.regexp_replace(s, f"&{name};", ch)
    s = F.regexp_replace(s, "&amp;", "&")
    # numeric entities are rare enough in practice that the JVM chain
    # handles only the named set; use `extract_text` (Python form)
    # when numeric refs matter
    s = F.regexp_replace(s, " ", " ")
    # NB: Java's \v is the VERTICAL-whitespace class (it matches
    # \n!), unlike Python's vertical-tab escape — spell the class out
    s = F.regexp_replace(s, "[ \t\r\f\u000b]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    # F.trim strips SPACES only — trim newlines too, like .strip()
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text",
    *, jvm: bool = False,
) -> DataFrame:
    """Column-level extraction: ``jvm=True`` uses the pure-Catalyst
    regex chain (whole-stage codegen, no Python boundary — the 100 TB
    default when numeric character references don't matter);
    ``jvm=False`` routes through an Arrow-batched pandas UDF running
    the full Python pipeline (numeric refs + cp1252 remap)."""
    if jvm:
        return df.withColumn(out_col, html_text_col(F.col(html_col)))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fn(s: pd.Series) -> pd.Series:
        return s.map(lambda v: html_to_text(v) if v is not None
                     else None)

    return df.withColumn(out_col, fn(F.col(html_col)))


# ---------------------------------------------------------------------------
# charset sniffing — the bytes→str bridge between the HTTP payload and
# the extractor, per the WHATWG encoding-sniffing order every browser
# implements: BOM first, then the Content-Type charset parameter, then
# a <meta> declaration in the first 1024 bytes, then UTF-8, then the
# HTML5 legacy fallback windows-1252 (which never fails: all 256 byte
# values map).
# ---------------------------------------------------------------------------

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""",
    re.IGNORECASE,
)
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([a-zA-Z0-9_\-]+)")


def sniff_charset(body: bytes, content_type: str | None = None) -> str:
    """Declared-or-detected encoding name for an HTML payload."""
    for bom, enc in _BOMS:
        if body.startswith(bom):
            return enc
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            return m.group(1).lower()
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        return m.group(1).decode("ascii").lower()
    return "utf-8"


def decode_html_bytes(
    body: bytes, content_type: str | None = None
) -> tuple[str, str]:
    """(text, encoding_used): decode per the sniffed charset, falling
    back UTF-8 → windows-1252 (the HTML5 legacy fallback; total —
    every byte decodes) when the declared encoding is unknown or the
    bytes don't conform.  Lenient like the extractor: crawl payloads
    lie about their encoding constantly."""
    enc = sniff_charset(body, content_type)
    for candidate in (enc, "utf-8", "windows-1252"):
        try:
            text = body.decode(candidate)
        except (UnicodeDecodeError, LookupError):
            continue
        # the -le/-be UTF-16/32 codecs (unlike utf-8-sig) keep the
        # BOM as a leading ZWNBSP — strip it so it cannot pollute
        # the extracted text
        if text[:1] == "\ufeff":
            text = text[1:]
        return text, candidate
    # Python's cp1252 (unlike WHATWG's) leaves five bytes unmapped
    # (81 8D 8F 90 9D) — replace those rather than fail
    return body.decode("windows-1252", "replace"), "windows-1252"


def extract_text_from_bytes(
    df: DataFrame, body_col: str = "body",
    content_type_col: str | None = None, out_col: str = "text",
) -> DataFrame:
    """The production ingest shape: BINARY HTTP bodies (e.g. straight
    from `sources.warc.read_warc`) → sniff charset → decode → extract
    text, one mapInPandas pass.  Adds ``out_col`` and ``encoding``
    (the charset actually used) to the frame; body/content-type
    columns pass through untouched."""
    from pyspark.sql import types as T

    fields = df.schema.fields + [
        T.StructField(out_col, T.StringType()),
        T.StructField("encoding", T.StringType()),
    ]
    schema = T.StructType(fields)
    cols = [f.name for f in df.schema.fields]

    def fn(batches):
        for pdf in batches:
            texts, encs = [], []
            for i in range(len(pdf)):
                body = pdf[body_col].iloc[i]
                if body is None:
                    texts.append(None)
                    encs.append(None)
                    continue
                ct = (pdf[content_type_col].iloc[i]
                      if content_type_col else None)
                raw, enc = decode_html_bytes(bytes(body), ct)
                texts.append(html_to_text(raw))
                encs.append(enc)
            pdf = pdf[cols].copy()
            pdf[out_col] = texts
            pdf["encoding"] = encs
            yield pdf

    return df.mapInPandas(fn, schema)


# ---------------------------------------------------------------------------
# link extraction — the step that closes the crawl loop: fetched page →
# anchors → RFC 3986 resolution against the page URL (honoring an HTML
# <base href>) → canonical frontier keys.  Extraction is lenient
# crawl-grade regex work (same stance as the text extractor above);
# resolution delegates to functions/url.py's spec-exact resolver.
# ---------------------------------------------------------------------------

# (?<![\w-]) keeps 'data-href'/'xhref' attributes from matching —
# '\b' alone fails because '-' is a non-word char and '-h' IS a
# word boundary
_HREF_RE = re.compile(
    r"""<a\s[^>]*?(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_BASE_RE = re.compile(
    r"""<base\s[^>]*?(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE,
)


def _attr_value(groups: tuple) -> str:
    v = next(g for g in groups if g is not None)
    # entity-decode attribute values: '&amp;' inside hrefs is the
    # single most common encoding in real markup
    return _ENT_RE.sub(_decode_entity, v).strip()


def extract_links(
    html: str, base_url: str | None = None, *,
    fetchable_only: bool = True,
) -> list[tuple[int, str, str]]:
    """``(position, href, resolved)`` per anchor, in document order.
    ``position`` counts EVERY extracted anchor (pre-filter), so it is
    stable under ``fetchable_only``.  The resolution base is the
    first ``<base href>`` (itself resolved against ``base_url``, per
    HTML) when present, else ``base_url``; with no base at all the
    href comes back unresolved.  ``fetchable_only`` keeps http(s)
    results only — mailto:/javascript:/data: links are real anchors
    but never frontier candidates."""
    from metrics_advisor_spark.functions.url import resolve_reference

    base = base_url
    bm = _BASE_RE.search(html)
    if bm is not None:
        declared = _attr_value(bm.groups())
        base = (resolve_reference(base_url, declared)
                if base_url else declared)
    out: list[tuple[int, str, str]] = []
    for pos, m in enumerate(_HREF_RE.finditer(html)):
        href = _attr_value(m.groups())
        resolved = resolve_reference(base, href) if base else href
        if fetchable_only and not resolved.startswith(
                ("http://", "https://")):
            continue
        out.append((pos, href, resolved))
    return out


def html_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html",
    id_col: str = "doc_id", *, fetchable_only: bool = True,
    canonical: bool = True,
) -> DataFrame:
    """Exploded link table: one row per extracted anchor —
    ``(doc_id, link_pos, href, resolved[, canonical])``.  One
    mapInPandas pass, no shuffle: each task explodes its own split's
    pages (the 100 TB shape — output grain is bounded by the pages a
    task already holds).  ``canonical`` appends
    `canonicalize_url(resolved)`, the frontier dedup key."""
    from metrics_advisor_spark.functions.url import canonicalize_url

    schema = f"{id_col} long, link_pos int, href string, resolved string"
    if canonical:
        schema += ", canonical string"

    def fn(batches):
        for pdf in batches:
            ids, poss, hrefs, ress, cans = [], [], [], [], []
            for i in range(len(pdf)):
                page = pdf[html_col].iloc[i]
                if page is None:
                    continue
                base = pdf[url_col].iloc[i]
                for pos, href, res in extract_links(
                        page, base, fetchable_only=fetchable_only):
                    ids.append(pdf[id_col].iloc[i])
                    poss.append(pos)
                    hrefs.append(href)
                    ress.append(res)
                    if canonical:
                        cans.append(canonicalize_url(res))
            out = {id_col: pd.Series(ids, dtype="int64"),
                   "link_pos": pd.Series(poss, dtype="int32"),
                   "href": hrefs, "resolved": ress}
            if canonical:
                out["canonical"] = cans
            yield pd.DataFrame(out)

    return df.select(id_col, url_col, html_col).mapInPandas(fn, schema)


_TITLE_RE = re.compile(
    r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL,
)
_LINK_RE = re.compile(
    r"<link\s[^>]*?>", re.IGNORECASE | re.DOTALL,
)
_META_RE = re.compile(
    r"<meta\s[^>]*?>", re.IGNORECASE | re.DOTALL,
)
_ATTR_RE = re.compile(
    r"""(?<![\w-])([a-zA-Z-]+)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
)


def _tag_attrs(tag: str) -> dict[str, str]:
    return {
        m.group(1).lower():
            next(g for g in m.groups()[1:] if g is not None)
        for m in _ATTR_RE.finditer(tag)
    }


def extract_html_meta(
    html: str, base_url: str | None = None,
) -> tuple[str | None, str | None, str | None]:
    """``(title, meta_description, canonical_hint)`` from a page.
    The canonical hint is the RFC 6596 ``<link rel="canonical">``
    target — the page's OWN declaration of its canonical URL, a
    first-class crawl dedup signal (mirror/session-id/pagination
    variants all declare the same target) — resolved against
    ``base_url`` and run through `canonicalize_url` so it is directly
    comparable with the URL-dedup keys.  Title/description are
    entity-decoded and whitespace-collapsed; all three are None when
    absent."""
    from metrics_advisor_spark.functions.url import (
        canonicalize_url,
        resolve_reference,
    )

    title = None
    tm = _TITLE_RE.search(html)
    if tm is not None:
        title = re.sub(
            r"\s+", " ", _ENT_RE.sub(_decode_entity, tm.group(1))
        ).strip() or None
    desc = None
    for m in _META_RE.finditer(html):
        attrs = _tag_attrs(m.group(0))
        if attrs.get("name", "").lower() == "description":
            desc = re.sub(
                r"\s+", " ",
                _ENT_RE.sub(_decode_entity, attrs.get("content", "")),
            ).strip() or None
            break
    hint = None
    for m in _LINK_RE.finditer(html):
        attrs = _tag_attrs(m.group(0))
        rels = attrs.get("rel", "").lower().split()
        if "canonical" in rels and attrs.get("href"):
            href = _ENT_RE.sub(_decode_entity, attrs["href"]).strip()
            resolved = (resolve_reference(base_url, href)
                        if base_url else href)
            hint = canonicalize_url(resolved)
            break
    return title, desc, hint


def html_meta(
    df: DataFrame, url_col: str = "url", html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, title, meta_description, canonical_hint) per page —
    one mapInPandas pass, no shuffle.  ``canonical_hint`` (when
    present) is the page's self-declared canonical URL in
    `canonicalize_url` form: a dedup pass that keys on
    ``coalesce(canonical_hint, canonical_url)`` collapses
    mirror/tracking/pagination families the URL key alone cannot."""

    def fn(batches):
        for pdf in batches:
            titles, descs, hints = [], [], []
            for i in range(len(pdf)):
                page = pdf[html_col].iloc[i]
                if page is None:
                    titles.append(None)
                    descs.append(None)
                    hints.append(None)
                    continue
                t, d, h = extract_html_meta(
                    page, pdf[url_col].iloc[i]
                )
                titles.append(t)
                descs.append(d)
                hints.append(h)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "title": titles,
                "meta_description": descs,
                "canonical_hint": hints,
            })

    return df.select(id_col, url_col, html_col).mapInPandas(
        fn,
        f"{id_col} long, title string, meta_description string, "
        "canonical_hint string",
    )
