"""robots.txt parsing and URL matching per RFC 9309 (public spec) —
the politeness/compliance filter every crawl pipeline applies before
(re)fetching, and a common post-hoc audit over crawled corpora
("which of these documents would today's robots rules exclude?").

Implemented semantics (RFC 9309 §2):
  - line-oriented `field: value` records; fields case-insensitive;
    comments (#) stripped; unknown fields ignored
  - GROUPS: one or more consecutive user-agent lines bind the rules
    that follow; the matcher picks the most specific UA token
    (longest match, case-insensitive; `*` fallback) and MERGES the
    rules of every group matching at that specificity — §2.2.2's
    combine rule for logically-one-group files split across the file
  - rule matching: patterns match from the path start; `*` matches
    any octet sequence, `$` anchors the pattern end
  - decision: the LONGEST matching rule wins (octet length of the
    pattern); on an allow/disallow tie, allow wins; no match ⇒
    allowed; empty-value Disallow ⇒ allows everything
  - `sitemap:` lines are collected (they live outside groups)

Spark surface: rules are tiny (a robots.txt is KBs) — `robots_gate`
broadcasts the COMPILED rule list and filters a URL/path column in
one narrow pass; per-host robots would join on host first (same
broadcast shape, rules side is always small).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_regex(pattern: str) -> re.Pattern:
    """Compile a robots path pattern: literal except `*` (any
    sequence) and a FINAL `$` (end anchor); match is from the path
    start."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


def parse_robots(txt: str) -> dict:
    """{'groups': [(ua_tokens, [(kind, pattern, regex, length)])],
    'sitemaps': [...]} — groups in file order; rule length is the
    RFC's specificity measure (octet length of the pattern)."""
    groups: list[tuple[list[str], list[tuple]]] = []
    delays: list[float | None] = []  # per group, aligned with groups
    sitemaps: list[str] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple] = []
    cur_delay: float | None = None
    ua_open = False  # consecutive user-agent lines extend the group

    def flush():
        nonlocal cur_uas, cur_rules, cur_delay
        if cur_uas:
            groups.append((cur_uas, cur_rules))
            delays.append(cur_delay)
        cur_uas, cur_rules, cur_delay = [], [], None

    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not ua_open:
                flush()
            cur_uas.append(value.lower())
            ua_open = True
            continue
        ua_open = False
        if field == "sitemap":
            sitemaps.append(value)
        elif field in ("allow", "disallow"):
            if not cur_uas:
                continue  # rules before any user-agent line: ignored
            if value == "":
                if field == "disallow":
                    continue  # empty Disallow allows everything
                continue
            cur_rules.append(
                (field, value, _rule_regex(value),
                 len(value.encode("utf-8")))
            )
        elif field == "crawl-delay" and cur_uas:
            # non-standard but ubiquitous politeness extension; a
            # malformed value is ignored (lenient, like unknown fields)
            try:
                cur_delay = float(value)
            except ValueError:
                pass
        # unknown fields: ignored
    flush()
    return {"groups": groups, "sitemaps": sitemaps, "delays": delays}


def _ua_products(ua: str) -> list[str]:
    """Product tokens of a client User-Agent string: each
    whitespace-separated product's name part (before any '/version'),
    lowercased.  RFC 9309 §2.2.1 matches the PRODUCT TOKEN itself
    case-insensitively — not an arbitrary substring of the UA string
    (ADVICE r12: a group for 'bot' must not capture
    'robotstxt-audit')."""
    out: list[str] = []
    for part in ua.lower().split():
        name = part.split("/", 1)[0]
        if name:
            out.append(name)
    return out


def _tok_matches(tok: str, products: list[str]) -> bool:
    """A group UA token matches when it equals a client product token
    or is a prefix of one ('googlebot' group captures
    'googlebot-news'); never by mid-string containment."""
    return any(p == tok or p.startswith(tok) for p in products)


def _matching_group_indices(parsed: dict, ua: str) -> list[int]:
    """RFC 9309 §2.2.1–2.2.2: indices of EVERY group matching at the
    best (longest-token) specificity; `*` groups as fallback."""
    products = _ua_products(ua)
    best_len = -1
    for tokens, _ in parsed["groups"]:
        for tok in tokens:
            if tok != "*" and tok and _tok_matches(tok, products):
                best_len = max(best_len, len(tok))
    if best_len >= 0:
        return [
            i for i, (tokens, _) in enumerate(parsed["groups"])
            if any(tok != "*" and tok and len(tok) == best_len
                   and _tok_matches(tok, products) for tok in tokens)
        ]
    return [i for i, (tokens, _) in enumerate(parsed["groups"])
            if "*" in tokens]


def _select_group(parsed: dict, ua: str):
    """Merged rules of every group matching at the best specificity
    (sites commonly split one logical group across the file; dropping
    later groups silently un-disallows paths — §2.2.2 combine)."""
    merged: list[tuple] = []
    for i in _matching_group_indices(parsed, ua):
        merged.extend(parsed["groups"][i][1])
    return merged


def crawl_delay(txt_or_parsed, ua: str = "*") -> float | None:
    """The Crawl-delay (seconds) the selected UA group requests, or
    None — the MAX across groups matching at the winning specificity
    (conservative politeness when a logical group is split)."""
    parsed = (txt_or_parsed if isinstance(txt_or_parsed, dict)
              else parse_robots(txt_or_parsed))
    ds = [parsed["delays"][i]
          for i in _matching_group_indices(parsed, ua)
          if parsed["delays"][i] is not None]
    return max(ds) if ds else None


def robots_sitemaps(txt_or_parsed) -> list[str]:
    """Sitemap URLs advertised by the file (they live outside groups
    and apply to every UA) — the discovery hook that feeds
    `functions/sitemap.py`'s frontier-admission view."""
    parsed = (txt_or_parsed if isinstance(txt_or_parsed, dict)
              else parse_robots(txt_or_parsed))
    return list(parsed["sitemaps"])


def robots_allowed(txt_or_parsed, path: str, ua: str = "*") -> bool:
    """Longest-match decision for ``path`` under the rules for
    ``ua``; allow wins ties; no matching rule ⇒ allowed."""
    parsed = (txt_or_parsed if isinstance(txt_or_parsed, dict)
              else parse_robots(txt_or_parsed))
    rules = _select_group(parsed, ua)
    verdict, best_len = True, -1
    for kind, _, rx, ln in rules:
        if rx.match(path):
            if ln > best_len or (ln == best_len and kind == "allow"):
                verdict = kind == "allow"
                best_len = ln
    return verdict


def robots_gate(
    df: DataFrame, robots_txt: str, *, path_col: str = "path",
    ua: str = "*", out_col: str = "allowed",
) -> DataFrame:
    """Annotate a path column with the robots decision: the rule list
    is parsed ONCE on the driver (robots.txt is KBs) and closed over
    by an Arrow pandas UDF — effectively a broadcast of compiled
    rules, one narrow pass over the URLs, no shuffle."""
    parsed = parse_robots(robots_txt)
    rules = _select_group(parsed, ua)

    @F.pandas_udf("boolean")
    def fn(s: pd.Series) -> pd.Series:
        def decide(path):
            if path is None:
                return None
            verdict, best_len = True, -1
            for kind, _, rx, ln in rules:
                if rx.match(path):
                    if ln > best_len or (
                        ln == best_len and kind == "allow"
                    ):
                        verdict = kind == "allow"
                        best_len = ln
            return verdict

        return s.map(decide)

    return df.withColumn(out_col, fn(F.col(path_col)))


def robots_sitemap_urls(
    df: DataFrame, robots_col: str = "robots_txt",
    out_col: str = "sitemap_url",
) -> DataFrame:
    """Explode each robots.txt payload's ``Sitemap:`` directives into
    one row per advertised sitemap URL — the DISCOVERY hook of the
    crawl loop (robots → sitemaps → entries → admission → schedule;
    the sitemaps.org protocol's robots.txt extension, honored
    file-wide regardless of UA group per RFC 9309 §2.3's
    unknown-line rule).

    Plan shape (100 TB): the parse is ONE narrow Arrow pass per
    robots payload (robots files are KBs; `parse_robots` is
    bounded-state line scanning) followed by a JVM-side explode — no
    shuffle, parallelism follows input splits.  Rows whose file
    advertises no sitemap emit one NULL row (`explode_outer`) so
    discovery coverage — which hosts expose no map — stays
    observable; filter ``out_col IS NOT NULL`` for the fetch list."""

    @F.pandas_udf("array<string>")
    def fn(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: [] if t is None else robots_sitemaps(str(t))
        )

    return df.withColumn(out_col, F.explode_outer(fn(F.col(robots_col))))
