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


def test_long_chain_converges_fully(spark):
    # diameter-24 chain: the old fixed 10-round cap silently mislabeled
    # this; default (no cap) now always reaches the transitive closure
    n = 25
    docs = _docs(spark, list(range(n)) + [99])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"] for r in apply_pair_dedup(docs, pairs).collect()
    )
    assert kept == [0, 99]


def test_deep_chain_propagation_exact(spark):
    """Uncapped propagation composes TWO hops per checkpointed round
    (r15-opt): a deep chain must still converge to the exact transitive
    closure, and disjoint components must not cross-talk — this pins
    the multi-hop rounds, the first-round single-hop ramp and the
    isEmpty convergence probe on a diameter-24 graph."""
    from metrics_advisor_spark.functions.dedup import propagate_labels

    # one 25-node chain (0..24) + one 3-node chain (100..102)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(24)]
        + [(100, 101), (101, 102)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["label"]
        for r in propagate_labels(pairs).collect()
    }
    want = {i: 0 for i in range(25)}
    want.update({i: 100 for i in (100, 101, 102)})
    assert got == want


def test_capped_propagation_warns(spark):
    import warnings

    from metrics_advisor_spark.functions.dedup import propagate_labels

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(24)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        propagate_labels(pairs, max_iterations=3).collect()
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "max_iterations" in str(w.message)
        for w in caught
    )


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
