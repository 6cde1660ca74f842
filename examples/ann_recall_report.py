"""ANN quality report: recall@k of the approximate vector-search
paths (PQ ADC, IVF-PQ) against exact Euclidean top-k.

Usage:  python examples/ann_recall_report.py [sf_dir]

This is the audit that justifies an index configuration before
trusting it at corpus scale — the vector-side analog of `lsh_eval`
for the MinHash family.  Since round 7 the audit itself is a library
function (`functions/pq.ann_recall_audit`, exact arm =
`functions/similarity.l2_topk`) and a hash-oracled contract query
(`ann_recall`); this example sweeps nprobe with it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metrics_advisor_spark import get_spark  # noqa: E402
from metrics_advisor_spark.functions.cacheutil import release_cached
from metrics_advisor_spark.functions.pq import ann_recall_audit


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("example_ann_recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    k = 10

    print(f"recall@{k} vs exact L2 top-{k} "
          f"({queries.count()} queries, {emb.count()} vectors):")
    for nprobe in (2, 4):
        audit = ann_recall_audit(
            queries, emb, k=k, k_coarse=8, m=4, k_codes=16, nprobe=nprobe,
        )
        rows = {r["method"]: r for r in audit.collect()}
        release_cached(audit)
        if nprobe == 2:
            print(f"  pq (m=4, k=16, flat ADC):   "
                  f"{rows['pq']['recall']:.2f}")
        print(f"  ivf-pq nprobe={nprobe}/8 cells:    "
              f"{rows['ivfpq']['recall']:.2f}")
    # Context for the absolute numbers: the synthetic testdata
    # embeddings are near-uniform in 64-d (measured intra/inter label
    # distance ratio ≈ 0.994 — no cluster structure), so distance
    # concentration caps ANY quantized index's recall here.  Recall
    # scales as theory predicts with a finer code budget (measured on
    # this table: m=4,k=16 → 0.13; m=8,k=16 → 0.29; m=8,k=64 → 0.39;
    # m=16,k=32 → 0.47) and the planted-exact-dup tests confirm the
    # mechanics; on real clustered embeddings the same settings sit
    # far higher.
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
