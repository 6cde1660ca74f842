"""Skew caps: boilerplate-shingle DF cap and LSH star expansion."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
)

BOILER = "terms of service apply to all content on this site"


@pytest.fixture(scope="module")
def boiler_docs(spark):
    # every doc shares the same boilerplate tail; 0/1 are true near-dups
    rows = [
        (0, "the quick brown fox jumps over the lazy dog " + BOILER),
        (1, "the quick brown fox jumps over the lazy cat " + BOILER),
        (2, "completely unrelated words about database engines " + BOILER),
        (3, "another separate text mentioning distributed systems " + BOILER),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_shingle_df_cap_keeps_true_pairs_drops_boilerplate_only(boiler_docs):
    uncapped = {(r["doc_a"], r["doc_b"])
                for r in jaccard_pairs(boiler_docs, threshold=0.2).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in jaccard_pairs(boiler_docs, threshold=0.2,
                                     max_shingle_df=3).collect()}
    assert (0, 1) in uncapped and (0, 1) in capped  # true near-dup survives
    # pairs held together ONLY by all-doc boilerplate disappear
    assert (2, 3) in uncapped
    assert (2, 3) not in capped
    assert capped <= uncapped  # the cap only ever removes pairs


def test_lsh_star_expansion_linear_pairs(spark):
    """A monster bucket of identical docs yields size−1 star pairs, not
    size·(size−1)/2, and every member is still linked to the keeper."""
    n = 12
    docs = spark.createDataFrame(
        [(i, "identical boilerplate text repeated everywhere for all docs")
         for i in range(n)],
        "doc_id long, text string",
    )
    all_pairs = minhash_lsh_pairs(docs).collect()
    assert len(all_pairs) == n * (n - 1) // 2  # parity mode: quadratic
    star = minhash_lsh_pairs(docs, max_bucket_size=5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in star}
    assert got == {(0, i) for i in range(1, n)}  # linear, keeper = min id


def test_star_expansion_leaves_small_buckets_exact(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "totally different content words here entirely now"),
        ],
        "doc_id long, text string",
    )
    exact = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(docs).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in minhash_lsh_pairs(docs, max_bucket_size=5).collect()}
    assert exact == capped == {(0, 1)}


def test_hamming_blocked_equals_all_pairs(spark):
    """Pigeonhole blocking is exact: same pair set as the O(n^2) form on
    real corpus sketches at several radii."""
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.dedup import (
        hamming_pairs,
        hamming_pairs_blocked,
        simhash,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    # plant near-identical variants so small radii have hits
    near = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    sk = simhash(docs.unionByName(near)).cache()
    for d in (4, 8, 16):
        exact = {(r["doc_a"], r["doc_b"], r["hamming"])
                 for r in hamming_pairs(sk, max_distance=d).collect()}
        blocked = {(r["doc_a"], r["doc_b"], r["hamming"])
                   for r in hamming_pairs_blocked(sk, max_distance=d).collect()}
        assert blocked == exact, f"radius {d}"
    assert {(r["doc_a"], r["doc_b"])
            for r in hamming_pairs_blocked(sk, max_distance=4).collect()}
