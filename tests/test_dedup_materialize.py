"""Dedup materialization (pair graph → kept corpus) and streaming dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrics_advisor_spark.functions.dedup import apply_pair_dedup


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in ids], "doc_id long, text string"
    )


def test_transitive_dedup_collapses_chain(spark):
    # chain 1-2, 2-3, 3-4 is ONE component → keeper 1 only
    docs = _docs(spark, [1, 2, 3, 4, 9])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"] for r in apply_pair_dedup(docs, pairs).collect()
    )
    assert kept == [1, 9]


def test_nontransitive_drops_only_doc_b(spark):
    docs = _docs(spark, [1, 2, 3, 4, 9])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in apply_pair_dedup(docs, pairs, transitive=False).collect()
    )
    assert kept == [1, 9]  # 2,3,4 all appear as doc_b


def test_transitive_dedup_two_components(spark):
    docs = _docs(spark, [1, 2, 5, 6, 7, 9])
    pairs = spark.createDataFrame(
        [(1, 2), (6, 7), (5, 6)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"] for r in apply_pair_dedup(docs, pairs).collect()
    )
    assert kept == [1, 5, 9]


def test_streaming_exact_dedup(spark, tmp_path):
    from metrics_advisor_spark.streaming.pipeline import (
        run_to_memory,
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma"), (5, "beta")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    run_to_memory(
        streaming_exact_dedup(stream),
        "dedup_stream",
        checkpoint=str(tmp_path / "ck"),
    )
    rows = spark.table("dedup_stream").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha", "beta", "gamma"]  # one winner per content
