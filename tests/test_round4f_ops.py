"""Round-4f operators: conversion latency, RFM segmentation, vocab
overlap, token Gini, curriculum staging, ACF profile, Adamic–Adar,
streaming k-sigma surface."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_conversion_latency_first_start_then_first_end(spark):
    from metrics_advisor_spark.operators.sessions import conversion_latency

    rows = [
        # user 1: view@100, purchase@160 → 60 s (purchase@50 is BEFORE
        # the first view and must not count)
        (1, _ts(50), "purchase"), (1, _ts(100), "view"),
        (1, _ts(160), "purchase"),
        # user 2: never purchases
        (2, _ts(100), "view"),
        # user 3: view@10, purchase@110 → 100 s
        (3, _ts(10), "view"), (3, _ts(110), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = conversion_latency(ev).collect()[0]
    assert got["n_converted"] == 2
    assert got["avg_s"] == 80.0
    assert got["p50_s"] == 80.0  # interpolated median of {60, 100}


def test_rfm_segments_counts_and_tiles(spark):
    from metrics_advisor_spark.operators.sessions import rfm_segments

    # 10 users; user u has u events of value u, last event at t=u·100 —
    # so recency/frequency/monetary are all monotone in u.
    rows = []
    for u in range(1, 11):
        for i in range(u):
            rows.append((u, _ts(u * 100 - i), float(u)))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    segs = rfm_segments(ev, n_tiles=5).collect()
    assert sum(r["n_users"] for r in segs) == 10
    # tiles stay within range
    for r in segs:
        for c in ("r_tile", "f_tile", "m_tile"):
            assert 1 <= r[c] <= 5
    # monotone structure: highest-spend user (u=10, most recent) is in
    # the top m_tile and f_tile but the LOWEST r_tile (most recent)
    assert any(
        r["m_tile"] == 5 and r["f_tile"] == 5 and r["r_tile"] == 1
        for r in segs
    )


def test_vocab_overlap_jaccard(spark):
    from metrics_advisor_spark.functions.text import vocab_overlap

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "s1"),
            (2, "beta gamma delta", "s2"),
            (3, "zeta eta", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    got = {(r["source_a"], r["source_b"]): r
           for r in vocab_overlap(docs).collect()}
    # s1 ∩ s2 = {beta, gamma} of union {alpha..delta} → 2/4
    assert got[("s1", "s2")]["n_inter"] == 2
    assert abs(got[("s1", "s2")]["jaccard"] - 0.5) < 1e-6
    # disjoint sources drop out (inner join)
    assert ("s1", "s3") not in got and ("s2", "s3") not in got


def test_token_gini_uniform_vs_skewed(spark):
    from metrics_advisor_spark.functions.text import token_gini

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "uniform"),
            (2, "z z z z z z z z z y", "skewed"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in token_gini(docs).collect()}
    # 4 equal frequencies → G = 0 exactly
    assert got["uniform"]["gini"] == 0.0
    assert got["skewed"]["gini"] > 0.3
    assert got["uniform"]["n_terms"] == 4


def test_curriculum_plan_budgets(spark):
    from metrics_advisor_spark.functions.corpus import curriculum_plan

    texts = [" ".join(["tok"] * n) for n in (5, 20, 40, 60, 80, 120)]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    plan = curriculum_plan(docs, n_stages=3).collect()
    assert sum(r["n_docs"] for r in plan) == 6
    assert sum(r["stage_tokens"] for r in plan) == 5 + 20 + 40 + 60 + 80 + 120
    by_stage = {r["stage"]: r for r in plan}
    # stage quality bands are ordered
    stages = sorted(by_stage)
    for lo, hi in zip(stages, stages[1:]):
        assert by_stage[lo]["max_q"] <= by_stage[hi]["min_q"] + 1e-9


def test_acf_lag_structure(spark):
    from metrics_advisor_spark.operators.trend import acf_profile

    # period-2 alternating series: ACF(2) = +1, ACF(1) = −1
    rows = [("m", h * 3600, float(h % 2)) for h in range(48)]
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = {r["lag"]: r["acf"] for r in acf_profile(hourly, max_lag=4).collect()}
    assert got[2] == 1.0 and got[4] == 1.0
    assert got[1] == -1.0 and got[3] == -1.0


def test_adamic_adar_wedge_scoring(spark):
    from metrics_advisor_spark.functions.graph import adamic_adar

    # path 1—2—3 plus triangle 4—5—6 (complete): only (1,3) is a
    # non-adjacent pair with a common neighbor; z=2 has degree 2.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6)],
        "doc_a long, doc_b long",
    )
    got = adamic_adar(pairs).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 3)
    assert r["n_common"] == 1
    assert abs(r["aa_score"] - 1.0 / math.log(2)) < 1e-6


def test_streaming_ksigma_matches_batch_filter(spark):
    """Stateless stream-static scoring (applied as batch ops) equals the
    plain batch filter."""
    from metrics_advisor_spark.streaming.pipeline import streaming_ksigma

    vals = [10.0] * 30 + [1000.0]
    rows = [("m", "s", _ts(100 + i), v) for i, v in enumerate(vals)]
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    baseline = sig.groupBy("metric", "series").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    )
    got = streaming_ksigma(sig, baseline, level=3.0).collect()
    assert len(got) == 1 and got[0]["value"] == 1000.0
