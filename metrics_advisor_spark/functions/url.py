"""URL canonicalization — the crawl-dedup primitive that runs before
any content-level dedup: most duplicate documents in a crawl are the
SAME resource under trivially different URLs, and canonicalizing the
key deduplicates them for free (no shingles, no hashes).

Rules implemented (RFC 3986 syntax-based normalization §6.2.2 plus
the crawl-specific conventions every production canonicalizer —
w3lib/courlan-style — applies, all public knowledge):
  - scheme and host lowercase
  - default port dropped (http:80, https:443)
  - path dot-segments resolved (RFC 3986 §5.2.4 remove_dot_segments)
  - empty path → "/"
  - percent-encoding normalized: unreserved characters
    (ALPHA / DIGIT / - . _ ~) decode, everything else keeps %XX with
    UPPERCASE hex
  - query parameters sorted by (key, value) — dedup canonicalization,
    deliberately stronger than pure RFC normalization
  - fragment dropped (never sent to the server)
  - optional tracking-parameter strip (utm_*, gclid, fbclid, msclkid)

Spark surface: `canonical_urls` (Arrow pandas UDF — the pipeline is
branchy string work) and `url_dup_groups` (canonical-key groupBy: one
shuffle on the canonical hash, the cheapest dedup pass that exists).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_TRACKING_RE = re.compile(r"^(utm_|gclid$|fbclid$|msclkid$)")


def _norm_pct(s: str) -> str:
    """Decode unreserved %XX escapes, uppercase the rest."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4.  Absolute paths protect the leading root
    segment; RELATIVE paths resolve '..' against earlier segments but
    KEEP unresolvable leading '..' (RFC 3986 merge semantics) instead
    of silently dropping them — dropping made 'a/../b' and '../b'
    both collapse onto dedup keys they don't share (ADVICE r12)."""
    absolute = path.startswith("/")
    floor = 1 if absolute else 0
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > floor and out[-1] != "..":
                out.pop()
            elif not absolute:
                out.append(seg)  # unresolvable: keep, don't drop
            continue
        out.append(seg)
    # a trailing '.' or '..' segment leaves a trailing slash
    if (path.endswith(("/.", "/..")) and out
            and out[-1] not in ("", "..")):
        out.append("")
    res = "/".join(out)
    if absolute and not res:
        res = "/"  # '/..'-style inputs reduce to the root, not ''
    return res


def resolve_reference(base: str, ref: str) -> str:
    """RFC 3986 §5.2 reference resolution — the step between link
    extraction and frontier admission: every href in a crawled page
    is a URI-reference that must be resolved against the page URL
    before it can be canonicalized, deduplicated, or fetched.

    Implements the §5.2.2 transform-references algorithm exactly:
    scheme-carrying refs replace everything; protocol-relative
    (``//host/p``) refs take the base scheme; absolute-path refs take
    the base authority; relative-path refs merge against the base
    path (§5.2.3) with §5.2.4 dot-segment removal; empty refs (and
    pure ``#frag`` refs) return the base (with the base query kept,
    per the ``defined`` rules).  The fragment always comes from the
    ref and is KEPT here — deciding to drop it is
    `canonicalize_url`'s job, and the two compose:
    ``canonicalize_url(resolve_reference(base, href))`` is the crawl
    frontier key.  Bounded leniency: an empty ``?`` query is treated
    as undefined, and a malformed base or ref (bad IPv6 authority)
    returns the ref untouched rather than guessing."""
    try:
        r = urlsplit(ref)
        b = urlsplit(base)
        _ = r.port, b.port  # force port validation
    except ValueError:
        return ref

    def recompose(scheme, netloc, path, query, frag):
        out = ""
        if scheme:
            out += scheme + ":"
        if netloc or (scheme and path.startswith("//")):
            out += "//" + netloc
        elif path.startswith("//"):
            out += "/."  # schemeless: the WHATWG '/.' serializer guard
        out += path
        if query:
            out += "?" + query
        if frag:
            out += "#" + frag
        return out

    if r.scheme:
        return recompose(
            r.scheme.lower(), r.netloc,
            _remove_dot_segments(r.path), r.query, r.fragment,
        )
    if r.netloc:  # protocol-relative
        return recompose(
            b.scheme.lower(), r.netloc,
            _remove_dot_segments(r.path), r.query, r.fragment,
        )
    if not r.path:
        query = r.query if r.query else b.query
        return recompose(
            b.scheme.lower(), b.netloc, b.path, query, r.fragment,
        )
    if r.path.startswith("/"):
        path = _remove_dot_segments(r.path)
    else:
        # §5.2.3 merge: a base WITH an authority and an empty path
        # merges onto "/"; otherwise everything up to the base path's
        # last "/" (inclusive)
        if b.netloc and not b.path:
            merged = "/" + r.path
        else:
            merged = b.path[:b.path.rfind("/") + 1] + r.path
        path = _remove_dot_segments(merged)
    return recompose(
        b.scheme.lower(), b.netloc, path, r.query, r.fragment,
    )


def canonicalize_url(url: str, *, strip_tracking: bool = False) -> str:
    """Canonical form of ``url`` per the module rules; relative or
    schemeless input comes back percent/dot-normalized but otherwise
    untouched (leniency — crawl link fields hold fragments of
    everything)."""
    raw = url.strip()
    try:
        parts = urlsplit(raw)
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        # malformed authority (bad IPv6 literal, junk port):
        # leniency — hand back the trimmed input untouched rather
        # than guessing at structure
        return raw
    netloc = host
    if parts.username:
        cred = parts.username + (
            f":{parts.password}" if parts.password else ""
        )
        netloc = f"{cred}@{netloc}"
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc += f":{port}"

    path = _norm_pct(parts.path)
    path = _remove_dot_segments(path)
    if netloc and not path:
        path = "/"

    query = ""
    if parts.query:
        pairs = []
        for tok in parts.query.split("&"):
            if not tok:
                continue
            k, _, v = tok.partition("=")
            k, v = _norm_pct(k), _norm_pct(v)
            if strip_tracking and _TRACKING_RE.match(k):
                continue
            pairs.append((k, v, "=" in tok))
        pairs.sort(key=lambda p: (p[0], p[1]))
        query = "&".join(
            f"{k}={v}" if has_eq else k for k, v, has_eq in pairs
        )

    out = ""
    if scheme:
        out += scheme + ":"
    # add '//' only when the INPUT had an authority: fabricating one
    # for 'http:foo' would promote the path to a host and break
    # idempotence (canonical(canonical(u)) != canonical(u))
    if parts.netloc or netloc:
        out += "//" + netloc
    elif path.startswith("//"):
        # dot-segment removal can leave an authority-less path
        # starting with '//' ('/.//a' → '//a'), which would re-parse
        # as a HOST; the WHATWG serializer guard ('/.' prefix) keeps
        # it a path and keeps canonicalization idempotent
        # (hypothesis-found)
        out += "/."
    out += path
    if query:
        out += "?" + query
    return out  # fragment dropped


def canonical_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical",
    *, strip_tracking: bool = False,
) -> DataFrame:
    """Column-level canonicalization via an Arrow-batched pandas
    UDF."""

    @F.pandas_udf("string")
    def fn(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: canonicalize_url(
                v, strip_tracking=strip_tracking
            ) if v is not None else None
        )

    return df.withColumn(out_col, fn(F.col(url_col)))


def url_dup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
    *, strip_tracking: bool = True,
) -> DataFrame:
    """Duplicate groups by canonical URL: (canonical, n_docs,
    min_doc_id) for groups with >1 member — ONE shuffle on the
    canonical key, no content ever read.  The cheapest dedup pass in
    any crawl pipeline; run it before the content-level operators."""
    can = canonical_urls(
        df.select(id_col, url_col), url_col,
        strip_tracking=strip_tracking,
    )
    return (
        can.groupBy("canonical")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def frontier_schedule(
    df: DataFrame, url_col: str = "canonical",
    delays: DataFrame | None = None, *, default_delay: float = 1.0,
) -> DataFrame:
    """Politeness plan for a fetch frontier: URLs grouped by host into
    FIFO waves spaced by the host's Crawl-delay — wave k of host h
    fetches at ``t0 + k * delay(h)``.  ``delays`` is a small
    (host, delay_sec) table (e.g. from `functions/robots.py:
    crawl_delay` over per-host robots files), broadcast; hosts
    without an entry use ``default_delay``.

    Adds (host, wave, fetch_offset_sec).  Plan shape (100 TB): host
    extraction is JVM-side ``parse_url``; the ONE shuffle is the
    per-host window partitioning (inherent — politeness is a per-host
    ordering); the delay join broadcasts.  No global window, no
    Python.

    Hostless rows (malformed/relative URLs — ``parse_url`` yields
    NULL) get NULL wave/offset and never form a single NULL-host
    window partition: they are not fetchable, and at crawl scale a
    billion malformed URLs would otherwise all land in ONE window
    partition — a straggler the politeness plan has no business
    creating.  They are spread over 1024 salted pseudo-host keys
    (``crc32(url) % 1024`` behind a NUL prefix no real lowercase host
    can collide with) inside the SAME single-pass plan, and their
    wave is nulled after the window — the input is scanned exactly
    once (r14 ADVICE: the prior filter-split form evaluated a
    nondeterministic upstream twice, so a rand-derived row could land
    in both branches or neither)."""
    from pyspark.sql.window import Window

    out = df.withColumn(
        # try_parse_url: plain parse_url THROWS on a malformed URL in
        # Spark 4 — one junk frontier row would kill the whole plan
        "host", F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    )
    hosted = F.col("host").isNotNull() & (F.col("host") != "")
    wkey = F.when(hosted, F.col("host")).otherwise(
        F.concat(
            F.lit("\x00"),
            (F.crc32(F.col(url_col)) % 1024).cast("string"),
        )
    )
    w = Window.partitionBy(wkey).orderBy(F.col(url_col))
    out = out.withColumn(
        "wave",
        F.when(
            hosted, (F.row_number().over(w) - 1).cast("long")
        ).otherwise(F.lit(None).cast("long")),
    )
    if delays is not None:
        d = delays.toDF("host", "delay_sec")
        out = out.join(F.broadcast(d), "host", "left")
        delay = F.coalesce(
            F.col("delay_sec"), F.lit(float(default_delay))
        )
    else:
        delay = F.lit(float(default_delay))
    out = out.withColumn(
        "fetch_offset_sec", F.round(F.col("wave") * delay, 6)
    )
    return out.drop("delay_sec") if delays is not None else out
