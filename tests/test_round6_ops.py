"""Round-6 regression tests for the round-5 ADVICE items: short-doc
passage semantics, empty-text scrub accounting, semdedup id-type
generality + tile chunking, and the streaming near-dup gate's
idempotent per-batch writes."""

import tempfile

from metrics_advisor_spark.functions.dedup import (
    scrub_shared_passages,
    scrub_to_fixpoint,
    shared_passage_pairs,
)
from metrics_advisor_spark.functions.similarity import semdedup


def test_short_docs_produce_no_passage_pairs(spark):
    # two identical 2-word docs used to report max_shared_words = n
    # (one truncated gram) whenever min_words <= n; now docs shorter
    # than n words never enter the positional index
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"),
         (3, "a b c d e f g h i j"), (4, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    rows = shared_passage_pairs(df, n=3, min_words=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["max_shared_words"] for r in rows}
    assert (1, 2) not in pairs  # 2-word docs carry no full 3-gram
    assert pairs[(3, 4)] == 10


def test_scrub_leaves_short_docs_untouched(spark):
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            scrub_shared_passages(df, n=3, min_words=3).collect()}
    assert rows[1]["clean_text"] == "tiny doc"
    assert rows[2]["clean_text"] == "tiny doc"
    assert rows[2]["n_words_removed"] == 0


def test_scrub_to_fixpoint_empty_text_consistent(spark):
    # an empty input doc must report n_words_removed = 0 (it used to
    # report 1: size(split('', ' ')) = 1 in, 0 left)
    df = spark.createDataFrame(
        [(1, ""), (2, "some real document text here that stays")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_to_fixpoint(df).collect()}
    assert rows[1]["n_words_removed"] == 0
    assert rows[1]["n_words_in"] == 0
    assert rows[2]["n_words_removed"] == 0


def test_semdedup_string_ids(spark):
    # the pair schema is derived from the id type now; string ids keep
    # the lexicographically smallest member of each dup cluster
    v = [0.6, 0.8, 0.0, 0.0]
    w = [0.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        [("doc-b", v), ("doc-a", v), ("doc-c", w)],
        "vec_id string, embedding array<float>",
    )
    kept = sorted(
        r["vec_id"]
        for r in semdedup(df, threshold=0.95, n_lists=2, id_col="vec_id")
        .collect()
    )
    assert kept == ["doc-a", "doc-c"]


def test_semdedup_chunked_tile_matches_unchunked(spark):
    # max_tile_cells small enough to force many row chunks must yield
    # the identical survivor set
    rows = [
        (i, [float(i % 4 == 0), float(i % 4 == 1),
             float(i % 4 == 2), float(i % 4 == 3)])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = sorted(
        r["vec_id"] for r in semdedup(df, threshold=0.99, n_lists=2).collect()
    )
    chunked = sorted(
        r["vec_id"]
        for r in semdedup(
            df, threshold=0.99, n_lists=2, max_tile_cells=5
        ).collect()
    )
    assert chunked == full
    assert len(full) == 4  # one survivor per basis direction


def test_neardup_gate_batch_retry_idempotent(spark):
    # re-draining the SAME source against a fresh store but the same
    # out_dir (simulating a foreachBatch retry of batch 0 within one
    # run would overwrite; across runs each run has its own leaf) must
    # not duplicate survivors within one run's leaves
    from metrics_advisor_spark.streaming.pipeline import (
        streaming_neardup_gate,
    )

    base = tempfile.mkdtemp(prefix="ma_t_neardup6_")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words in this second document here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{base}/src"
    )
    streaming_neardup_gate(
        stream, store_dir=f"{base}/store", out_dir=f"{base}/out"
    )
    out = spark.read.parquet(f"{base}/out")
    # partition-discovery adds run/batch dirs, not columns the data
    # rows duplicate; doc ids stay unique
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [1, 2]
