"""End-to-end crawl ingestion with the r12 crawl stack.

Usage:  python examples/crawl_pipeline.py [sf_dir]

Builds a WARC archive from the sample docs (the format crawl corpora
actually arrive in — here the per-doc fixture shape), then runs the
full ingest chain a training-data pipeline applies before any
content-level operator:

  sitemap frontier (robots + known-URL pre-gate) →
  WARC records → HTTP responses (status gate) → robots.txt gate →
  canonical-URL dedup → link extraction → next-wave frontier
  (the crawl LOOP: discovered links minus already-fetched, r13) →
  next-wave SCHEDULING (per-host FIFO waves × Crawl-delay parsed
  from the robots file — fetch→parse→admit→schedule→next-wave, r14) →
  HTML/PDF/ZIP→text extraction → quality/dedup via the fluent
  Corpus API → WET text sidecar + CDX random-access index (r14)

Prints the surviving doc count at each stage and returns the stage
counts (tests/test_round14_ops.py drives the whole loop at sf0.001).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions import Corpus
from metrics_advisor_spark.functions.html import extract_text, html_links
from metrics_advisor_spark.functions.robots import (
    crawl_delay,
    robots_gate,
    robots_sitemap_urls,
)
from metrics_advisor_spark.functions.pdf import (
    attach_pdf_payload,
    extract_pdf_text,
)
from metrics_advisor_spark.functions.sitemap import (
    sitemap_entries,
    sitemap_frontier,
)
from metrics_advisor_spark.functions.url import (
    canonical_urls,
    frontier_schedule,
)
from metrics_advisor_spark.sources.warc import (
    attach_warc_payload,
    make_wet,
    read_wet,
    warc_cdx,
    warc_records_df,
)
from metrics_advisor_spark.sources.zip_archive import (
    attach_zip_payload,
    extract_zip_entries,
)

ROBOTS = """User-agent: *
Disallow: /doc/1*
"""


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    counts: dict[str, int] = {}
    spark = get_spark("example_crawl")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    counts["docs"] = n
    print(f"{'docs':16s} {n:6d}")

    # 0a. sitemap DISCOVERY (r15): the sitemap URLs themselves come
    # from the host's robots.txt `Sitemap:` directives — the loop's
    # true entry point.  Only ADVERTISED maps are fetched; a host
    # whose robots.txt exposes no map contributes nothing.
    robots_df = spark.createDataFrame(
        [("example.org",
          ROBOTS + "Sitemap: https://example.org/sitemap.xml\n")],
        "host string, robots_txt string",
    )
    discovered = robots_sitemap_urls(robots_df).filter(
        F.col("sitemap_url").isNotNull()
    )
    counts["sitemaps_discovered"] = discovered.count()
    print(f"{'sitemaps-found':16s} {counts['sitemaps_discovered']:6d}")

    # 0b. frontier admission (r13): the discovered sitemap names every
    # candidate URL; the admission view pre-applies robots + known-URL
    # dedup BEFORE a single fetch happens — at crawl scale this is
    # the stage that saves the fetch budget
    sm_xml = docs.select(
        "doc_id",
        F.concat(
            F.lit("<urlset><url><loc>https://example.org/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("</loc></url></urlset>"),
        ).alias("sitemap"),
    ).withColumn(
        "sitemap_url", F.lit("https://example.org/sitemap.xml")
    ).join(
        # the discovery gate: fixture pages hang off the one
        # advertised map; nothing enters the frontier except through
        # a discovered sitemap
        F.broadcast(discovered.select("sitemap_url")),
        "sitemap_url",
        "left_semi",
    ).drop("sitemap_url")
    frontier = sitemap_frontier(sitemap_entries(sm_xml), ROBOTS)
    counts["frontier_admit"] = frontier.filter("admitted").count()
    print(f"{'frontier-admit':16s} {counts['frontier_admit']:6d}")

    # 1. archive + re-ingest (odd ids exercise the gzip arm)
    recs = warc_records_df(attach_warc_payload(docs))
    resp = recs.filter(F.col("warc_type") == "response")
    counts["responses"] = resp.count()
    print(f"{'responses':16s} {counts['responses']:6d}")

    # 2. HTTP status gate (fixture: ids ≡0 mod 10 are 404s)
    ok = resp.filter(F.col("http_status") == 200)
    counts["status_200"] = ok.count()
    print(f"{'status=200':16s} {counts['status_200']:6d}")

    # 3. robots gate on the URL path
    with_path = ok.withColumn(
        "path", F.regexp_replace("target_uri", r"^https://[^/]+", "")
    )
    allowed = robots_gate(with_path, ROBOTS).filter("allowed")
    counts["robots_allowed"] = allowed.count()
    print(f"{'robots-allowed':16s} {counts['robots_allowed']:6d}")

    # 4. canonical-URL dedup (cheapest dedup pass there is)
    canon = canonical_urls(allowed, "target_uri", strip_tracking=True)
    first = canon.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("canonical")
            .orderBy(F.col("archive").cast("long"))
        ),
    ).filter("rn = 1")
    counts["url_dedup"] = first.count()
    print(f"{'url-dedup':16s} {counts['url_dedup']:6d}")

    # 4b. link extraction → next-wave frontier (r13: the stage that
    # makes a crawler a CRAWLER — each fetched page's anchors resolve
    # against the page URL, canonicalize, and whatever is not already
    # fetched joins the next frontier wave).  The fixture bodies carry
    # no anchors, so plant two per page: one self-link (dropped by the
    # anti-join) and one genuinely new URL.
    pages = first.select(
        F.col("archive").cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.concat(
            F.lit('<a href="/doc/'),
            F.col("archive").cast("string"),
            F.lit('">self</a><a href="../next/n'),
            F.col("archive").cast("string"),
            F.lit('?b=2&amp;a=1">new</a>'),
        ).alias("html"),
    )
    links = html_links(pages)
    fetched = canon.select(F.col("canonical").alias("known")).distinct()
    next_wave = (
        links.select("canonical").distinct()
        .join(fetched, F.col("canonical") == F.col("known"),
              "left_anti")
    )
    counts["links_extracted"] = links.count()
    counts["next_frontier"] = next_wave.count()
    print(f"{'links-extracted':16s} {counts['links_extracted']:6d}")
    print(f"{'next-frontier':16s} {counts['next_frontier']:6d}")

    # 4c. next-wave SCHEDULING (r14 — the stage that closes the loop:
    # discovered → admitted → SCHEDULED).  The fetcher already holds
    # each host's robots file; `crawl_delay` parses the politeness
    # interval and `frontier_schedule` lays the admitted URLs into
    # per-host FIFO waves spaced by it.
    host_robots = {"example.org": ROBOTS + "Crawl-delay: 1.5\n"}
    delays = spark.createDataFrame(
        [(h, float(crawl_delay(txt)))
         for h, txt in sorted(host_robots.items())],
        "host string, delay_sec double",
    )
    plan = frontier_schedule(next_wave, delays=delays)
    counts["next_scheduled"] = plan.count()
    last_off = plan.agg(F.max("fetch_offset_sec")).first()[0]
    counts["last_fetch_offset_sec"] = last_off
    print(f"{'next-scheduled':16s} {counts['next_scheduled']:6d}"
          f"  (last fetch at +{last_off}s)")

    # 5. HTML→text (pure-Catalyst JVM chain) then content pipeline
    text = extract_text(
        first.select(
            F.col("archive").cast("long").alias("doc_id"),
            F.col("body").cast("string").alias("html"),
        ),
        html_col="html", jvm=True,
    ).select("doc_id", "text")

    # 5b. PDF sidecar (r13): crawl corpora are PDF-heavy — wrap one
    # slice of the surviving docs into genuine PDFs and extract the
    # text back through the spec parser (format-agnostic ingestion:
    # both branches land in the same text table)
    pdf_slice = text.filter(F.col("doc_id") % 10 == 7)
    pdf_docs = extract_pdf_text(attach_pdf_payload(pdf_slice)).select(
        "doc_id", F.regexp_replace("text", "\n", " ").alias("text")
    )
    counts["pdf_extracted"] = pdf_docs.count()
    print(f"{'pdf-extracted':16s} {counts['pdf_extracted']:6d}")
    text = text.filter(F.col("doc_id") % 10 != 7).unionByName(pdf_docs)

    # 5c. ZIP sidecar (r13): dataset drops arrive as archives — wrap
    # another slice into genuine two-entry ZIPs and pull the text
    # entries back out through the spec parser (same text table)
    zip_slice = text.filter(F.col("doc_id") % 10 == 3)
    zip_docs = (
        extract_zip_entries(attach_zip_payload(zip_slice))
        .filter(F.col("entry_name").startswith("doc_"))
        .select("doc_id", "text")
    )
    counts["zip_extracted"] = zip_docs.count()
    print(f"{'zip-extracted':16s} {counts['zip_extracted']:6d}")
    text = text.filter(F.col("doc_id") % 10 != 3).unionByName(zip_docs)

    c = Corpus(text)
    stages = [
        ("quality", c := c.quality_filter(min_score=0.1)),
        ("exact-dedup", c := c.exact_dedup()),
        ("near-dedup", c.near_dedup(method="minhash")),
    ]
    for name, stage in stages:
        counts[name] = stage.df.count()
        print(f"{name:16s} {counts[name]:6d}")

    # 6. WET text sidecar + CDX index (r14): emit the surviving text
    # as a genuine gzip-member WET file, then read it back with the
    # file-level readers — text consumers skip the HTML parse (WET)
    # and random-access consumers fetch one record per ranged read
    # (CDX).  File-grain parallelism is the Common Crawl shape; the
    # 40-doc slice keeps the driver-side file build example-sized.
    import tempfile

    wet_rows = [
        (int(r["doc_id"]), r["text"])
        for r in text.orderBy("doc_id").limit(40).collect()
    ]
    wet_dir = tempfile.mkdtemp(prefix="crawl_wet_")
    with open(f"{wet_dir}/part0.warc.wet.gz", "wb") as f:
        f.write(make_wet(wet_rows, gzipped=True))
    counts["wet_docs"] = read_wet(spark, wet_dir).count()
    counts["cdx_members"] = warc_cdx(spark, wet_dir).count()
    print(f"{'wet-docs':16s} {counts['wet_docs']:6d}")
    print(f"{'cdx-members':16s} {counts['cdx_members']:6d}")
    return counts


if __name__ == "__main__":
    main(*sys.argv[1:2])
