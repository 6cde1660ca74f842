"""Corpus triage report — the round-3 analytics surface end to end.

Runs the audit queries a data-curation team fires at a fresh corpus
drop: provenance dashboard, token distribution sanity (Zipf), heavy
hitters, dedup cluster shape, MinHash estimator calibration, chunk &
packing preview — and prints one compact report.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions import (
    chunk_documents,
    dup_cluster_sizes,
    heavy_hitters,
    jaccard_pairs,
    minhash_jaccard_estimate,
    sequence_packing,
    source_stats,
    weighted_sample,
    zipf_slope,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_curation")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== provenance ==")
    for r in source_stats(docs).orderBy("source").collect()[:8]:
        print(f"  {r['source']:>10s}  {r['n_docs']:5d} docs  "
              f"avg {r['avg_chars']:7.1f} ch  q={r['avg_quality']:.3f}  "
              f"dups={r['n_exact_dups']}")

    z = zipf_slope(docs).collect()[0]
    print(f"== token distribution ==  zipf slope {z['zipf_slope']:.3f} "
          f"over top {z['n_terms']} terms (natural text ~ -1)")

    print("== heavy hitters ==")
    for r in heavy_hitters(docs, k=5).collect():
        print(f"  #{r['rank']} {r['term']:<12s} df={r['df']} tf={r['total_tf']}")

    pairs = jaccard_pairs(docs, threshold=0.5)
    print("== near-dup clusters ==")
    for r in dup_cluster_sizes(pairs).orderBy("cluster_size").collect()[:5]:
        print(f"  size {r['cluster_size']}: {r['n_clusters']} clusters")

    print("== minhash calibration (est vs exact) ==")
    for r in minhash_jaccard_estimate(docs).orderBy("doc_a").collect()[:5]:
        print(f"  ({r['doc_a']},{r['doc_b']})  est={r['jaccard_est']:.3f} "
              f"exact={r['jaccard_exact']:.3f}")

    n_chunks = chunk_documents(docs).count()
    bins = sequence_packing(docs, budget_tokens=2048).count()
    sample = weighted_sample(docs.selectExpr("doc_id", "n_chars"), k=10)
    print(f"== training prep ==  {n_chunks} chunks, {bins} packed "
          f"sequences, weighted sample head: "
          f"{[r['doc_id'] for r in sample.collect()[:5]]}")

    from metrics_advisor_spark.functions.corpus import global_shuffle
    from metrics_advisor_spark.functions.curation import mixture_plan

    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    weights = {s: 1.0 for s in sorted(srcs)[:3]}
    print("== mixture recipe (uniform over 3 sources, 1M tokens) ==")
    for r in mixture_plan(docs, weights, token_budget=1_000_000).orderBy(
        "source"
    ).collect():
        print(f"  {r['source']:<8s} avail={r['available_tokens']:>7d} "
              f"target={r['target_tokens']:>7d} rate={r['sampling_rate']} "
              f"epochs={r['n_epochs']}")

    order = global_shuffle(docs, n_shards=4, seed=0)
    head = order.orderBy("shard", "shard_pos").limit(5).collect()
    print("== training order (seed 0) ==",
          [(r["shard"], r["shard_pos"], r["doc_id"]) for r in head])


if __name__ == "__main__":
    main(*sys.argv[1:2])
