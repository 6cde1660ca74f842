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
