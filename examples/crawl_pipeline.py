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
  HTML/PDF/ZIP→text extraction → quality/dedup via the fluent
  Corpus API

Prints the surviving doc count at each stage.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions import Corpus
from metrics_advisor_spark.functions.html import extract_text, html_links
from metrics_advisor_spark.functions.robots import robots_gate
from metrics_advisor_spark.functions.pdf import (
    attach_pdf_payload,
    extract_pdf_text,
)
from metrics_advisor_spark.functions.sitemap import (
    sitemap_entries,
    sitemap_frontier,
)
from metrics_advisor_spark.functions.url import canonical_urls
from metrics_advisor_spark.sources.warc import (
    attach_warc_payload,
    warc_records_df,
)
from metrics_advisor_spark.sources.zip_archive import (
    attach_zip_payload,
    extract_zip_entries,
)

ROBOTS = """User-agent: *
Disallow: /doc/1*
"""


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_crawl")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    print(f"{'docs':16s} {n:6d}")

    # 0. frontier discovery (r13): a sitemap names every candidate URL;
    # the admission view pre-applies robots + known-URL dedup BEFORE a
    # single fetch happens — at crawl scale this is the stage that
    # saves the fetch budget
    sm_xml = docs.select(
        "doc_id",
        F.concat(
            F.lit("<urlset><url><loc>https://example.org/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("</loc></url></urlset>"),
        ).alias("sitemap"),
    )
    frontier = sitemap_frontier(sitemap_entries(sm_xml), ROBOTS)
    print(f"{'frontier-admit':16s} {frontier.filter('admitted').count():6d}")

    # 1. archive + re-ingest (odd ids exercise the gzip arm)
    recs = warc_records_df(attach_warc_payload(docs))
    resp = recs.filter(F.col("warc_type") == "response")
    print(f"{'responses':16s} {resp.count():6d}")

    # 2. HTTP status gate (fixture: ids ≡0 mod 10 are 404s)
    ok = resp.filter(F.col("http_status") == 200)
    print(f"{'status=200':16s} {ok.count():6d}")

    # 3. robots gate on the URL path
    with_path = ok.withColumn(
        "path", F.regexp_replace("target_uri", r"^https://[^/]+", "")
    )
    allowed = robots_gate(with_path, ROBOTS).filter("allowed")
    print(f"{'robots-allowed':16s} {allowed.count():6d}")

    # 4. canonical-URL dedup (cheapest dedup pass there is)
    canon = canonical_urls(allowed, "target_uri", strip_tracking=True)
    first = canon.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("canonical")
            .orderBy(F.col("archive").cast("long"))
        ),
    ).filter("rn = 1")
    print(f"{'url-dedup':16s} {first.count():6d}")

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
    print(f"{'links-extracted':16s} {links.count():6d}")
    print(f"{'next-frontier':16s} {next_wave.count():6d}")

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
    print(f"{'pdf-extracted':16s} {pdf_docs.count():6d}")
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
    print(f"{'zip-extracted':16s} {zip_docs.count():6d}")
    text = text.filter(F.col("doc_id") % 10 != 3).unionByName(zip_docs)

    c = Corpus(text)
    stages = [
        ("quality", c := c.quality_filter(min_score=0.1)),
        ("exact-dedup", c := c.exact_dedup()),
        ("near-dedup", c.near_dedup(method="minhash")),
    ]
    for name, stage in stages:
        print(f"{name:16s} {stage.df.count():6d}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
