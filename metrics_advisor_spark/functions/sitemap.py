"""Sitemap ingestion — the final piece of the crawl-admission stack
(VERDICT r12 item 5): `robots.py` decides MAY-fetch, `url.py` decides
SEEN-before, this module decides WORTH-fetching by turning
sitemaps.org XML (urlset and sitemapindex documents) into a frontier
table joined against both gates.

Scope (sitemaps.org protocol 0.9):

* ``<urlset>`` documents: ``<url>`` children with ``loc`` (required),
  ``lastmod``, ``changefreq``, ``priority``,
* ``<sitemapindex>`` documents: ``<sitemap>`` children with ``loc`` /
  ``lastmod`` — emitted with ``kind='sitemap'`` so the caller can feed
  them back into the fetch queue instead of the document frontier,
* standard XML entity/CDATA handling via stdlib ElementTree,
  namespace-agnostic tag matching (real sitemaps use the 0.9
  namespace, generators frequently omit or typo it),
* malformed XML and unknown root elements are rejected with
  ValueError (parse-per-spec, same rule as the codec modules).

The frontier view composes the three public-knowledge admission
stages: canonicalize (RFC 3986, `functions/url.py`) → robots gate
(RFC 9309, `functions/robots.py`) → anti-membership against the
already-known canonical set.  At 100 TB each stage is a narrow pass
or one broadcast/hash join — no Python beyond Arrow batches, payloads
never cross a shuffle.

Reference parity note: the reference engine
(/root/reference/metrics_advisor.py) has no crawl surface; this module
is part of the beyond-reference LLM-data-pipeline stack.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTRY_SCHEMA = (
    "doc_id long, kind string, loc string, lastmod string, "
    "changefreq string, priority double"
)


def _local(tag: str) -> str:
    """Tag name with any ``{namespace}`` prefix stripped."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml: str) -> list[dict]:
    """Entries of one sitemap document, in document order.  Each dict
    has kind ('url' for urlset children, 'sitemap' for sitemapindex
    children), loc, lastmod, changefreq, priority (None when the
    element is absent).  Entries missing ``loc`` are dropped per the
    protocol (loc is the only required child); a root element other
    than urlset/sitemapindex raises."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise ValueError(f"sitemap: malformed XML ({e})") from None
    root_name = _local(root.tag)
    if root_name == "urlset":
        child_name, kind = "url", "url"
    elif root_name == "sitemapindex":
        child_name, kind = "sitemap", "sitemap"
    else:
        raise ValueError(
            f"sitemap: unexpected root element <{root_name}>"
        )
    out: list[dict] = []
    for child in root:
        if _local(child.tag) != child_name:
            continue  # foreign elements: ignored per protocol leniency
        fields: dict = {"kind": kind, "loc": None, "lastmod": None,
                        "changefreq": None, "priority": None}
        for el in child:
            name = _local(el.tag)
            if name in ("loc", "lastmod", "changefreq"):
                fields[name] = (el.text or "").strip() or None
            elif name == "priority":
                try:
                    fields["priority"] = float((el.text or "").strip())
                except ValueError:
                    raise ValueError(
                        f"sitemap: non-numeric priority {el.text!r}"
                    ) from None
        if fields["loc"]:
            out.append(fields)
    return out


def sitemap_entries(
    df: DataFrame, xml_col: str = "sitemap", id_col: str = "doc_id",
    *, strict: bool = True,
) -> DataFrame:
    """Explode one sitemap XML document per row into its entries:
    (doc_id, kind, loc, lastmod, changefreq, priority).  Arrow-batched
    per-payload parse (stdlib ElementTree) — the same bounded-state
    shape as the WARC record walk; parallelism follows input splits.

    ``strict=False`` quarantines instead of raising (the 100 TB crawl
    mode, same contract as ``extract_pdf_text``): a malformed document
    yields ONE row with every entry field null and the ValueError text
    in an ``error`` column; well-formed documents carry error=null per
    entry."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for d, xml in zip(b[id_col], b[xml_col]):
                try:
                    entries = parse_sitemap(str(xml))
                except ValueError as e:
                    if strict:
                        raise
                    rows.append(
                        (int(d), None, None, None, None, None, str(e))
                    )
                    continue
                for e in entries:
                    rows.append(
                        (int(d), e["kind"], e["loc"], e["lastmod"],
                         e["changefreq"], e["priority"], None)
                    )
            cols = ["doc_id", "kind", "loc", "lastmod",
                    "changefreq", "priority", "error"]
            out = pd.DataFrame(rows, columns=cols)
            yield out if not strict else out.drop(columns=["error"])

    schema = _ENTRY_SCHEMA + (", error string" if not strict else "")
    return df.select(id_col, xml_col).mapInPandas(fn, schema)


def sitemap_frontier(
    entries: DataFrame, robots_txt: str, known: DataFrame | None = None,
    *, ua: str = "*",
) -> DataFrame:
    """Frontier-admission view over parsed sitemap entries: canonical
    URL (RFC 3986, tracking params stripped), robots verdict on the
    URL path (RFC 9309), membership against the already-known
    canonical set, and the combined ``admitted`` flag (a NEW, ALLOWED
    document URL — index entries route back to the fetch queue, never
    into the frontier).

    Plan: canonicalization + path extraction are one narrow Arrow
    pass; the robots rules are compiled once on the driver and closed
    over (broadcast); ``known`` joins as a LEFT join on the canonical
    key — broadcast when small, hash otherwise — so the whole view is
    one pass plus at most one shuffle."""
    from metrics_advisor_spark.functions.robots import robots_gate
    from metrics_advisor_spark.functions.url import canonical_urls

    canon = canonical_urls(
        entries.withColumnRenamed("loc", "url"), strip_tracking=True
    ).withColumnRenamed("url", "loc")
    # robots matches the PATH (+ query) of the canonical form
    path = F.regexp_replace(
        F.col("canonical"), r"^[a-z][a-z0-9+.-]*://[^/]*", ""
    )
    canon = canon.withColumn(
        "path", F.when(path == "", "/").otherwise(path)
    )
    gated = robots_gate(canon, robots_txt, ua=ua)
    if known is not None:
        k = known.select(
            F.col(known.columns[0]).alias("canonical")
        ).distinct().withColumn("known", F.lit(True))
        gated = gated.join(k, "canonical", "left").withColumn(
            "known", F.coalesce(F.col("known"), F.lit(False))
        )
    else:
        gated = gated.withColumn("known", F.lit(False))
    return gated.select(
        "doc_id", "kind", "loc", "canonical", "lastmod",
        "changefreq", "priority", "allowed", "known",
        (
            (F.col("kind") == "url")
            & F.col("allowed")
            & ~F.col("known")
        ).alias("admitted"),
    )
