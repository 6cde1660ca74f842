"""Round-7 regression tests: cache hygiene for the training-style
pipelines that persist corpus-derived intermediates (r06 ADVICE /
VERDICT item 5 — `ivfpq_search` kept amap/resid and
`dsir_model`/`dsir_weights` kept the doc-bucket aggregate cached
forever in long-lived sessions)."""

import random

from pyspark.sql import functions as F

from metrics_advisor_spark.functions.cacheutil import release_cached


def _persisted_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _emb(spark, n=60, d=16, seed=7):
    rng = random.Random(seed)
    return spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def _docs(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rng = random.Random(11)
    return spark.createDataFrame(
        [
            (i, "src0" if i % 3 == 0 else "src1",
             " ".join(rng.choice(words) for _ in range(12)))
            for i in range(40)
        ],
        "doc_id long, source string, text string",
    )


def test_ivfpq_search_release_frees_cache(spark):
    from metrics_advisor_spark.functions.pq import ivfpq_search

    before = _persisted_count(spark)
    emb = _emb(spark)
    res = ivfpq_search(
        emb.filter(F.col("vec_id") < 3), emb,
        k_coarse=4, m=4, k_codes=8, nprobe=2, k=5,
    )
    rows = res.collect()
    assert rows  # pipeline actually ran while the cache was live
    assert _persisted_count(spark) > before  # intermediates were cached
    release_cached(res)
    assert _persisted_count(spark) == before
    # idempotent + plan still recomputable after release
    release_cached(res)
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, rows))


def test_dsir_pipelines_release_frees_cache(spark):
    from metrics_advisor_spark.functions.selection import (
        dsir_model,
        dsir_resample,
        dsir_weights,
    )

    docs = _docs(spark)
    before = _persisted_count(spark)

    model = dsir_model(docs, target=F.col("source") == "src0", n_buckets=64)
    assert model.count() > 0
    weights = dsir_weights(
        docs, target=F.col("source") == "src0", n_buckets=64
    )
    assert weights.count() > 0
    sample = dsir_resample(
        docs, target=F.col("source") == "src0", k=5, n_buckets=64
    )
    assert sample.count() == 5
    assert _persisted_count(spark) > before
    for df in (model, weights, sample):
        release_cached(df)
    assert _persisted_count(spark) == before
