"""Semantics tests for the corpus-curation family (functions/curation.py)
and the counter-rate operator — hand-built fixtures with known answers.
DuckDB parity for the contract forms lives in test_oracle_parity.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.curation import (
    contamination_check,
    line_dedup,
    ngram_repetition,
    pii_scrub,
    quality_flags,
    stratified_sample,
)
from metrics_advisor_spark.operators.trend import counter_rate
from tests.conftest import make_signals_df


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_counts_and_redaction(spark):
    df = _docs_df(spark, [
        (1, "contact alice@example.com or bob@mail.co now"),
        (2, "host 10.0.0.1 and 192.168.1.255 up"),
        (3, "call +1-415-555-2671 or +44-020-794-0123"),
        (4, "clean text with no pii at all"),
    ])
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (2, 0, 0)
    assert out[1]["redacted_text"] == "contact <EMAIL> or <EMAIL> now"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["redacted_text"] == "host <IP> and <IP> up"
    assert out[3]["n_phones"] == 2
    assert out[3]["redacted_text"] == "call <PHONE> or <PHONE>"
    assert out[4]["redacted_text"] == "clean text with no pii at all"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (0, 0, 0)


def test_ngram_repetition_known_fraction(spark):
    # "a b a b a b" → 3-grams: (a b a), (b a b), (a b a), (b a b):
    # 4 total, 2 distinct → dup_frac 0.5
    df = _docs_df(spark, [(1, "a b a b a b"), (2, "p q r s t")])
    out = {r["doc_id"]: r for r in ngram_repetition(df, n=3).collect()}
    assert (out[1]["n_ngrams"], out[1]["n_distinct"]) == (4, 2)
    assert out[1]["dup_frac"] == pytest.approx(0.5)
    assert out[2]["dup_frac"] == 0.0


def test_quality_flags_gates(spark):
    good = "the quick brown fox jumps over the lazy dog and then " \
           "runs far away to rest under a tall green tree today"  # 22 words
    short = "too short"
    symbols = " ".join(["@#$%"] * 25)  # no alpha words
    df = _docs_df(spark, [(1, good), (2, short), (3, symbols)])
    out = {r["doc_id"]: r for r in quality_flags(df).collect()}
    assert out[1]["pass_quality"] is True
    assert out[2]["flag_words"] is False and out[2]["pass_quality"] is False
    assert out[3]["flag_alpha"] is False and out[3]["pass_quality"] is False


def test_contamination_prefix_overlap(spark):
    bench = _docs_df(spark, [(100, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")])
    corpus = _docs_df(spark, [
        # full copy of the benchmark doc → all 6 of its 5-grams overlap
        (1, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
        # 5-word prefix + fresh suffix → exactly one overlapping 5-gram
        (2, "b1 b2 b3 b4 b5 x1 x2 x3 x4 x5"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
    ])
    out = {r["doc_id"]: r for r in
           contamination_check(corpus, bench, n=5).collect()}
    assert out[1]["n_overlap"] == 6 and out[1]["contam_frac"] == pytest.approx(1.0)
    assert out[2]["n_overlap"] == 1
    assert 3 not in out  # clean doc emits no row


def test_stratified_sample_deterministic_and_capped(spark, tmp_path):
    rows = [(i, "t", "en" if i % 3 else "fr") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = sorted(r["doc_id"] for r in
               stratified_sample(df, "lang", cap=30).collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(df, "lang", cap=30).collect())
    assert a == b  # pure function of doc_id — no RNG, no partition effects
    sizes = {r["lang"]: r["cnt"] for r in
             stratified_sample(df, "lang", cap=30)
             .groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # expected ≈30 per stratum; allow ±4σ (σ≈√30)
    for n in sizes.values():
        assert 8 <= n <= 55
    # a stratum smaller than the cap is kept whole (rate clamps at 1)
    tiny = spark.createDataFrame(
        [(i, "t", "zz") for i in range(10)],
        "doc_id long, text string, lang string",
    )
    assert stratified_sample(tiny, "lang", cap=30).count() == 10


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    df = _docs_df(spark, [
        (1, "HEADER\nunique one line\nanother line one\nFOOTER"),
        (2, "HEADER\nunique two line\nFOOTER"),
        (3, "HEADER\nFOOTER"),
        (4, "solo document single line"),
    ])
    out = {r["doc_id"]: r for r in line_dedup(df, min_df=2).collect()}
    assert out[1]["clean_text"] == "unique one line\nanother line one"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 2)
    assert out[2]["clean_text"] == "unique two line"
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["clean_text"] == "solo document single line"


def test_line_dedup_self_repeat_does_not_promote(spark):
    # doc 1 repeats its own line 3× — still df=1 (distinct docs), kept
    df = _docs_df(spark, [(1, "same\nsame\nsame"), (2, "other line")])
    out = {r["doc_id"]: r for r in line_dedup(df, min_df=2).collect()}
    assert out[1]["clean_text"] == "same\nsame\nsame"
    assert out[1]["n_dropped"] == 0


def test_counter_rate_reset_semantics(spark):
    # one series: 5 → 8 (+3) → 3 (reset → +3) → 10 (+7); all in bucket 0
    # of a 600 s grid starting at t0 (t0 chosen 600-aligned)
    sig = make_signals_df(
        spark, {("m", "s"): [5.0, 8.0, 3.0, 10.0]}, t0=1640588400, step=15
    )
    rows = counter_rate(sig, bucket_s=600).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["metric"] == "m" and r["bucket_epoch"] == 1640588400
    assert r["increase"] == pytest.approx(13.0)
    assert r["rate_per_s"] == pytest.approx(13.0 / 600, abs=1e-6)


def test_counter_rate_first_sample_excluded(spark):
    # a single-sample series contributes nothing (no prev → no increase)
    sig = make_signals_df(spark, {("m", "only"): [42.0]}, t0=1640588400)
    assert counter_rate(sig, bucket_s=600).count() == 0


def test_weighted_sample_deterministic_and_biased(spark):
    from metrics_advisor_spark.functions.curation import weighted_sample

    # 200 light docs (w=10) vs 200 heavy docs (w=10000)
    rows = [(i, 10 if i < 200 else 10000) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    s1 = [r["doc_id"] for r in weighted_sample(df, k=50).collect()]
    s2 = [r["doc_id"] for r in weighted_sample(df, k=50).collect()]
    assert s1 == s2  # pure function of (doc_id, weight)
    heavy = sum(1 for d in s1 if d >= 200)
    assert heavy >= 40  # inclusion probability follows weight


def test_source_stats_counts_dups_and_langs(spark):
    from metrics_advisor_spark.functions.curation import source_stats

    rows = [
        (0, "alpha beta", "en", "web", 10),
        (1, "alpha beta", "en", "web", 10),   # exact dup within web
        (2, "gamma delta", "fr", "web", 11),
        (3, "epsilon", "en", "books", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in source_stats(df).collect()}
    assert got["web"]["n_docs"] == 3
    assert got["web"]["n_exact_dups"] == 1
    assert got["web"]["n_langs"] == 2
    assert got["books"]["n_exact_dups"] == 0
