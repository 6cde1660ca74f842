"""Passage-level dedup sweep — the round-5 substring/near-dup surface.

Composes the three dedup granularities a training-data pipeline runs
before mixing a new crawl into the corpus:

1. whole-doc near-dups (MinHash-LSH candidate pairs),
2. PASSAGE-level exact overlap (longest shared word-8-gram run — the
   quote/boilerplate reuse whole-doc Jaccard dilutes),
3. cross-source near-dup audit (mirror sources that re-crawl with
   small edits, invisible to exact content hashing),

then shows the admission decision a streaming ingest would make with
`streaming_neardup_gate` (same banding, batch mode here).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions import (
    cross_source_neardup,
    minhash_lsh_pairs,
    shared_passage_pairs,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_passage_dedup")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    # plant what a fresh crawl drop looks like: a mirror source carrying
    # truncated re-crawls of every 7th doc
    words = F.split(F.col("text"), " ")
    mirror = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.size(words) - 1), " ").alias("text"),
        F.lit("mirror").alias("source"),
    )
    corpus = docs.unionByName(mirror)

    print("== whole-doc near-dup candidates (MinHash-LSH) ==")
    lsh = minhash_lsh_pairs(corpus, k=16, bands=4)
    print(f"  {lsh.count()} candidate pairs")

    print("== shared passages (>= 12 words, exact) ==")
    passages = shared_passage_pairs(corpus, n=8, min_words=12)
    for r in passages.orderBy(F.desc("max_shared_words")).collect()[:5]:
        print(f"  docs {r['doc_a']} ~ {r['doc_b']}: "
              f"{r['max_shared_words']} shared words in {r['n_runs']} run(s)")

    print("== cross-source near-dup audit ==")
    for r in cross_source_neardup(corpus).orderBy(
        F.desc("n_neardup_pairs")
    ).collect()[:5]:
        print(f"  {r['src_a']} x {r['src_b']}: "
              f"{r['n_neardup_pairs']} near-dup doc pairs")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
