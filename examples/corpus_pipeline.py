"""Training-corpus prep with the fluent Corpus API.

Usage:  python examples/corpus_pipeline.py [sf_dir]

quality gate → language gate → CCNet perplexity gate (r14) → exact
dedup → MinHash-LSH near-dedup → substring scrub (keep one canonical
copy of every duplicated run, r14) → token-budget sample; prints the
surviving doc count at each stage.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions import Corpus


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_corpus")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = Corpus(docs)
    stages = [
        ("raw", c),
        ("quality", c := c.quality_filter(min_score=0.1)),
        ("lang=en", c := c.lang_filter("en")),
        ("perplexity", c := c.perplexity_gate(max_nll_per_tri=6.74)),
        ("exact-dedup", c := c.exact_dedup()),
        ("near-dedup", c := c.near_dedup(method="minhash")),
        ("span-scrub", c := c.scrub_exact_substrings(keep_first=True)),
        ("sampled", c.sample_tokens(budget=20_000)),
    ]
    for name, stage in stages:
        print(f"{name:12s} {stage.df.count():6d} docs")


if __name__ == "__main__":
    main(*sys.argv[1:2])
