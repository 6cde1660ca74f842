"""Round-4e operators: unigram surprisal, duplicated-ngram fraction,
sorted-neighborhood blocking, canonical selection, Theil–Sen,
Spearman, PSI drift, key-skew audit, streaming CDC latest."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_unigram_surprisal_orders_rare_above_common(spark):
    from metrics_advisor_spark.functions.text import unigram_surprisal

    # doc 0: all common tokens; doc 1: unique tokens → higher surprisal
    docs = _docs(spark, [
        "the the the the", "zyx qwv jkl mno", "the the zyx the",
    ])
    got = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    assert got[0]["n_tokens"] == 4
    assert got[0]["surprisal"] < got[2]["surprisal"] < got[1]["surprisal"]
    # hand check doc 0: cf(the) = 7 of 12 corpus tokens → −ln(7/12)
    assert abs(got[0]["surprisal"] - (-math.log(7 / 12))) < 1e-5


def test_dup_ngram_fraction_flags_planted_copy(spark):
    from metrics_advisor_spark.functions.dedup import dup_ngram_fraction

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "one two three four five six seven")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_ngram_fraction(docs).collect()}
    assert got[1]["dup_fraction"] == 1.0  # exact copy: every shingle shared
    assert got[2]["dup_fraction"] == 1.0
    assert got[3]["dup_fraction"] == 0.0
    assert got[3]["n_dup_shingles"] == 0


def test_snm_pairs_window_and_key(spark):
    from metrics_advisor_spark.functions.dedup import (
        sorted_neighborhood_pairs,
    )

    # Docs 0/1 share a long prefix (same block key); doc 2 is far away
    # in sort order and never pairs with them.
    # Docs 0/1 agree on >24 normalized chars (case/punct-insensitively),
    # so they share a block key; doc 2 sorts far away.
    docs = _docs(spark, [
        "Common Prefix, Here Is Quite Long -- tail one extra",
        "common prefix here is quite long tail two",
        "zzz totally different text",
    ])
    pairs = sorted_neighborhood_pairs(docs, window=3, key_len=24).collect()
    got = {(r["doc_lo"], r["doc_hi"]) for r in pairs}
    assert (0, 1) in got
    assert all(2 not in p for p in got)
    # rank gaps bounded by window − 1
    assert all(r["rank_gap"] <= 2 for r in pairs)


def test_canonical_select_prefers_quality(spark):
    from metrics_advisor_spark.functions.curation import (
        canonical_representatives,
    )

    # doc 0 short (low quality score), doc 1 long (higher score); the
    # pair clusters them — canonical must be doc 1 despite higher id.
    long_text = " ".join(["word"] * 60) + "."
    docs = _docs(spark, ["word word.", long_text, "standalone text here"])
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    got = {r["cluster"]: r for r in
           canonical_representatives(docs, pairs).collect()}
    assert got[0]["canonical_id"] == 1
    assert got[0]["n_members"] == 2
    assert got[2]["canonical_id"] == 2  # singleton keeps itself
    assert got[2]["n_members"] == 1


def test_theil_sen_robust_to_outlier(spark):
    from metrics_advisor_spark.operators.trend import theil_sen

    # clean line: v = 2·h ; one wild outlier should barely move the
    # median slope while it would wreck the OLS slope
    rows = [("m", h * 3600, 2.0 * h) for h in range(20)]
    rows[10] = ("m", 10 * 3600, 1000.0)
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = theil_sen(hourly).collect()[0]
    assert abs(got["slope_per_hour"] - 2.0) < 0.2
    assert got["n_pairs"] == 20 * 19 // 2


def test_theil_sen_max_slots_thins(spark):
    from metrics_advisor_spark.operators.trend import theil_sen

    rows = [("m", h * 3600, 3.0 * h) for h in range(40)]
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = theil_sen(hourly, max_slots=10).collect()[0]
    assert got["n_pairs"] <= 10 * 9 // 2
    assert abs(got["slope_per_hour"] - 3.0) < 1e-6


def test_spearman_monotone_nonlinear_is_one(spark):
    from metrics_advisor_spark.operators.trend import spearman_corr

    rows = []
    for h in range(12):
        rows.append(("a", h * 3600, float(h)))
        rows.append(("b", h * 3600, float(h) ** 3))   # monotone, nonlinear
        rows.append(("c", h * 3600, float(-h)))        # anti-monotone
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = {(r["metric_a"], r["metric_b"]): r["rho"]
           for r in spearman_corr(hourly).collect()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0


def test_psi_drift_zero_for_stable_large_for_shift(spark):
    from metrics_advisor_spark.operators.quality import psi_drift

    rows = []
    # 'stable': identical value cycle in both halves → PSI ≈ 0
    # 'shifted': second half moved by +100 → PSI large
    for i in range(200):
        v = float(i % 10)
        rows.append(("stable", _ts(1000 + i * 60), v))
        shift = 0.0 if i < 100 else 100.0
        rows.append(("shifted", _ts(1000 + i * 60), v + shift))
    sig = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    got = {r["metric"]: r for r in psi_drift(sig).collect()}
    assert got["stable"]["psi"] < 0.01
    assert got["shifted"]["psi"] > 1.0
    assert got["stable"]["n_ref"] + got["stable"]["n_cur"] == 200


def test_key_skew_audit_profiles_hot_key(spark):
    from metrics_advisor_spark.operators.quality import key_skew_audit

    rows = [(1,)] * 90 + [(k,) for k in range(2, 12)]
    df = spark.createDataFrame(rows, "k long")
    got = key_skew_audit(df, "k").collect()[0]
    assert got["n_rows"] == 100
    assert got["n_keys"] == 11
    assert got["max_freq"] == 90
    assert abs(got["top1_share"] - 0.9) < 1e-6
    assert got["p50_freq"] == 1.0
    assert got["skew_ratio"] >= 1.0


def test_latest_by_key_stream_matches_batch(spark):
    """The streaming aggregate's struct-max tiebreak must equal the
    batch latest_by_key on the same data (applied as batch ops)."""
    from metrics_advisor_spark.operators.history import latest_by_key
    from metrics_advisor_spark.streaming.pipeline import latest_by_key_stream

    rows = [
        (1, _ts(100), 10, "a", 1.0),
        (1, _ts(100), 11, "b", 2.0),  # same ts — higher event_id wins
        (2, _ts(60), 4, "c", 3.0),
        (2, _ts(50), 5, "d", 4.0),    # later ts wins regardless of id
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, "
        "event_type string, value double",
    )
    got = {r["user_id"]: r for r in latest_by_key_stream(ev).collect()}
    want = {r["user_id"]: r for r in latest_by_key(ev).collect()}
    for uid in (1, 2):
        assert got[uid]["event_id"] == want[uid]["event_id"]
        assert got[uid]["event_type"] == want[uid]["event_type"]
        assert got[uid]["value"] == want[uid]["value"]


def test_lang_agreement_shares_sum_to_one(spark):
    from metrics_advisor_spark.functions.text import lang_agreement

    docs = spark.createDataFrame(
        [
            (1, "the cat of the house is big", "en"),
            (2, "el gato de la casa que es", "en"),   # mislabeled
            (3, "le chat et les maisons des un", "fr"),
            (4, "9182 7364 0011", "fr"),               # no anchors → und
        ],
        "doc_id long, text string, lang string",
    )
    rows = lang_agreement(docs).collect()
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["share_of_lang"]
    assert all(abs(v - 1.0) < 1e-6 for v in by_lang.values())
    cells = {(r["lang"], r["lang_pred"]) for r in rows}
    assert ("en", "es") in cells   # the mislabel shows up as disagreement
    assert ("fr", "und") in cells
