"""Target-domain data selection with DSIR (Xie et al. 2023).

Usage:  python examples/dsir_selection_pipeline.py [sf_dir]

Fit a hashed n-gram importance model offline (target = the src0
slice), score the corpus, resample toward the target distribution, and
show the source-mixture shift the resampling achieves — the standard
pretraining-data curation loop, entirely in Spark SQL.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions.selection import (
    dsir_model,
    dsir_resample,
    dsir_score,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_dsir")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = F.col("source") == "src0"

    # 1. offline model fit (≤ n_buckets+1 rows — broadcastable anywhere)
    model = dsir_model(docs, target)
    print(f"model rows: {model.count()}")

    # 2. score the corpus against the pre-fit model (the same scoring
    #    plan the streaming gate runs per micro-batch)
    scored = dsir_score(docs.select("doc_id", "text"), model)
    scored.summary("min", "50%", "max").select(
        "summary", "log_weight"
    ).show()

    # 3. resample 10% of the corpus toward the target
    k = max(10, docs.count() // 10)
    sample = dsir_resample(docs, target, k=k)

    # 4. mixture shift: source shares before vs after
    before = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = (
        sample.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    before.join(after, "source", "left").orderBy("source").show(25)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
