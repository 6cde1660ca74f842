"""corpus_prep / token_budget_sample (functions/corpus.py)."""

import numpy as np
import pytest

from metrics_advisor_spark.functions.corpus import (
    corpus_prep,
    doc_features,
    token_budget_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    rng = np.random.default_rng(3)
    en = "the cat sat of the mat and it is a fine day to walk"
    es = "el perro y la casa de que en la calle"
    for i in range(60):
        base = en if i % 3 else es
        # pad with junk words so quality varies; every 10th is a dup
        pad = " ".join(f"w{rng.integers(0, 9)}" for _ in range(int(rng.integers(0, 120))))
        text = base if i % 10 == 0 else f"{base} {pad}".strip()
        rows.append((i, text))
    rows.append((1000, rows[0][1]))  # exact duplicate of doc 0
    rows.append((1001, rows[3][1]))  # exact duplicate of doc 3
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_features_one_projection(docs):
    feats = doc_features(docs)
    assert set(feats.columns) == {
        "doc_id", "content_hash", "lang_pred", "quality_score", "n_tokens"
    }
    # no shuffle: a pure projection keeps the input partitioning
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_prep_dedups_and_filters(docs):
    out = corpus_prep(docs, min_quality=0.0, langs=("en", "es", "und"))
    ids = [r["doc_id"] for r in out.collect()]
    # duplicates keep the smallest doc_id
    assert 0 in ids and 1000 not in ids
    assert 3 in ids and 1001 not in ids
    # language gate drops es docs when restricted to en
    en_only = corpus_prep(docs, min_quality=0.0, langs=("en",))
    langs = {r["lang_pred"] for r in en_only.collect()}
    assert langs == {"en"}


def test_token_budget_sample_two_phase_equals_window(docs):
    budget = 600
    naive = sorted(
        map(tuple, token_budget_sample(docs, budget, two_phase=False).collect())
    )
    fast = sorted(
        map(tuple, token_budget_sample(docs, budget, two_phase=True).collect())
    )
    assert naive == fast
    assert len(naive) > 0
    # every language's running sum respects the budget
    for r in token_budget_sample(docs, budget).collect():
        assert r["cum_tokens"] <= budget


def test_token_budget_sample_deterministic(docs):
    a = sorted(map(tuple, token_budget_sample(docs, 500).collect()))
    b = sorted(map(tuple, token_budget_sample(docs, 500).collect()))
    assert a == b


def test_token_budget_sample_budget_monotone(docs):
    small = {r["doc_id"] for r in token_budget_sample(docs, 300).collect()}
    large = {r["doc_id"] for r in token_budget_sample(docs, 900).collect()}
    assert small <= large


def test_chunk_documents_overlap_and_coverage(spark):
    from metrics_advisor_spark.functions.corpus import chunk_documents

    text = "".join(chr(ord("a") + (i % 26)) for i in range(1200))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    chunks = (
        chunk_documents(df, chunk_chars=512, overlap=64)
        .orderBy("chunk_id")
        .collect()
    )
    # stride 448 → ceil((1200-64)/448) = 3 chunks
    assert len(chunks) == 3 and chunks[0]["n_chunks"] == 3
    for i, c in enumerate(chunks):
        assert c["chunk_start"] == i * 448
        assert c["chunk_text"] == text[i * 448 : i * 448 + 512]
    # consecutive chunks overlap by exactly 64 chars
    assert chunks[0]["chunk_text"][-64:] == chunks[1]["chunk_text"][:64]
    # full coverage: chunks reassemble the document
    assert chunks[0]["chunk_text"][:448] + chunks[1]["chunk_text"][:448] \
        + chunks[2]["chunk_text"] == text
    # short doc → single chunk
    short = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    one = chunk_documents(short).collect()
    assert len(one) == 1 and one[0]["chunk_text"] == "tiny"


def test_sequence_packing_fills_budget(spark):
    from metrics_advisor_spark.functions.corpus import sequence_packing

    # 40 docs × 100 tokens; n_shards=1 keeps one cumsum chain so the
    # bin arithmetic is exactly checkable (shard is hash-derived now)
    docs = [(i * 8, " ".join(["tok"] * 100)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bins = {
        r["bin_id"]: r
        for r in sequence_packing(df, budget_tokens=2048, n_shards=1)
        .collect()
    }
    # cumsum packing: bins 0.. hold floor-boundary splits of 4000 tokens
    assert sum(r["n_docs"] for r in bins.values()) == 40
    assert sum(r["bin_tokens"] for r in bins.values()) == 4000
    # every bin except the last holds 20-21 docs (2048/100)
    full_bins = [r for r in bins.values() if r["bin_id"] < max(bins)]
    for r in full_bins:
        assert 2000 <= r["bin_tokens"] <= 2148
    # hash sharding: every doc still packed exactly once across shards
    sharded = sequence_packing(df, budget_tokens=2048, n_shards=8).collect()
    assert sum(r["n_docs"] for r in sharded) == 40
    assert sum(r["bin_tokens"] for r in sharded) == 4000
    assert len({r["shard"] for r in sharded}) > 1  # ids actually spread
