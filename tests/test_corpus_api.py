"""Fluent Corpus pipeline: each stage delegates to the tested operators
and composes lazily."""

import pytest
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.corpus_api import Corpus


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [
        (1, base * 3),                      # good en doc
        (2, base * 3),                      # exact dup of 1
        (3, (base * 3) + " extra"),         # near dup of 1
        (4, "el la de y que en " * 12),     # spanish
        (5, "!!! ??? ..."),                 # junk (low quality)
        (6, "a completely different english text about spark and the data " * 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_and_lang_gates_fuse_lazily(docs):
    c = Corpus(docs).quality_filter(min_score=0.05).lang_filter("en")
    kept = {r.doc_id for r in c.df.select("doc_id").collect()}
    assert 5 not in kept          # junk filtered
    assert 4 not in kept          # spanish filtered
    assert {1, 2, 3, 6} <= kept
    # whole chain is one plan: no exchange needed for two row filters
    plan = c.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_exact_then_near_dedup(docs):
    c = Corpus(docs).exact_dedup()
    kept = {r.doc_id for r in c.df.select("doc_id").collect()}
    assert 2 not in kept and 1 in kept      # min doc_id kept

    c2 = c.near_dedup(method="jaccard", threshold=0.5)
    kept2 = {r.doc_id for r in c2.df.select("doc_id").collect()}
    assert 3 not in kept2 and 1 in kept2    # near-dup of 1 dropped
    assert 6 in kept2                       # distinct doc survives


def test_sample_tokens_budget(docs):
    from metrics_advisor_spark.functions.text import token_count_col

    c = Corpus(docs).sample_tokens(budget=60)
    out = c.df.select(
        "doc_id", token_count_col(F.col("text")).alias("n")
    ).collect()
    assert out  # something survives
    assert sum(r.n for r in out) <= 60 + max(r.n for r in out)


def test_minhash_and_simhash_paths_run(docs):
    kept_mh = {
        r.doc_id
        for r in Corpus(docs).near_dedup(method="minhash").df.select("doc_id").collect()
    }
    assert 2 not in kept_mh and 1 in kept_mh  # exact dups are LSH-certain
    kept_sh = {
        r.doc_id
        for r in Corpus(docs)
        .near_dedup(method="simhash", max_distance=4)
        .df.select("doc_id")
        .collect()
    }
    assert 2 not in kept_sh and 1 in kept_sh

    with pytest.raises(ValueError):
        Corpus(docs).near_dedup(method="nope")


def test_decontaminate_and_shuffle_and_mixture(spark, docs):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog and runs far away")],
        "doc_id long, text string",
    )
    for use_bloom in (False, True):
        kept = {
            r.doc_id
            for r in Corpus(docs)
            .decontaminate(bench, n=5, bloom=use_bloom)
            .df.select("doc_id")
            .collect()
        }
        # docs 1-3 share the benchmark 5-grams; 4-6 don't
        assert kept == {4, 5, 6}, kept

    shuffled = Corpus(docs).shuffle(n_shards=2, seed=3).df.collect()
    assert {r.doc_id for r in shuffled} == {1, 2, 3, 4, 5, 6}
    assert all(r.shard in (0, 1) for r in shuffled)

    plan = {
        r["source"]: r
        for r in Corpus(
            docs.withColumn(
                "source",
                F.when(F.col("doc_id") <= 3, "web").otherwise("books"),
            )
        )
        .mixture(weights={"web": 0.5, "books": 0.5}, token_budget=100)
        .collect()
    }
    assert set(plan) == {"web", "books"}
    assert all(r["n_epochs"] >= 1 for r in plan.values())


def test_semantic_dedup_stage(spark, docs):
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = {i: [float(x) for x in rng.normal(0, 1, 8)] for i in (1, 3, 4, 5, 6)}
    vecs[2] = vecs[1]  # doc 2's embedding duplicates doc 1's
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "doc_id long, embedding array<float>"
    )
    kept = {
        r.doc_id
        for r in Corpus(docs)
        .semantic_dedup(emb, threshold=0.95, n_lists=2)
        .df.select("doc_id")
        .collect()
    }
    assert kept == {1, 3, 4, 5, 6}  # 2 dropped; keeper (1) survives


def test_split_stage_partitions_and_filters(docs):
    split = Corpus(docs).split(fractions=(0.5, 0.25))
    rows = split.df.select("doc_id", "split").collect()
    assert len(rows) == 6
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # re-running routes every doc identically (hash, not RNG)
    again = Corpus(docs).split(fractions=(0.5, 0.25)).df.collect()
    assert sorted(map(tuple, rows)) == sorted(
        (r["doc_id"], r["split"]) for r in again
    )
    train = split.only_split("train").df
    assert train.where(F.col("split") != "train").count() == 0


def test_scrub_exact_substrings_stage(spark):
    from metrics_advisor_spark.functions import Corpus

    import random
    import string

    rng = random.Random(11)

    def rand(n):
        # NON-periodic filler: repetitive filler like "alpha " * 30 is
        # itself a duplicated run (its windows recur within the doc)
        # and would be scrubbed — correctly
        return "".join(rng.choice(string.ascii_lowercase + " ")
                       for _ in range(n))

    boiler = "B" * 90
    u1, u2, u3 = "alpha " + rand(170), rand(170) + " omega", rand(170)
    rows = [(1, u1 + boiler), (2, boiler + u2), (3, u3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in Corpus(df).scrub_exact_substrings().df.collect()}
    assert "B" * 32 not in out[1] and "B" * 32 not in out[2]
    assert "alpha" in out[1] and "omega" in out[2]
    assert out[3] == u3
