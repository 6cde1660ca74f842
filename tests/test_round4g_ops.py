"""Round-4g operators: bigram surprisal, RRF fusion, stickiness,
inter-event gaps, weekly profile, Benford audit, KS drift,
streaming sliding counts."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_bigram_surprisal_orders_scrambled_above_fluent(spark):
    from metrics_advisor_spark.functions.text import bigram_surprisal

    # docs 0-2 repeat the same word order; doc 3 scrambles it → its
    # bigrams are rare in the corpus LM → higher surprisal
    fluent = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(0, fluent), (1, fluent), (2, fluent), (3, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    assert got[0]["n_bigrams"] == 5
    assert got[3]["bigram_surprisal"] > got[0]["bigram_surprisal"]
    # single-token doc drops out
    one = spark.createDataFrame([(9, "word")], "doc_id long, text string")
    assert bigram_surprisal(one).count() == 0


def test_rrf_fuse_combines_ranks(spark):
    from metrics_advisor_spark.functions.text import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse(a, b, k_const=60, topk=10).collect()}
    # doc 2 appears in both lists → highest fused score
    assert got[2]["rank"] == 1
    assert abs(got[2]["rrf_score"] - round(1 / 61 + 1 / 62, 6)) < 1e-9
    # docs present in one list only still score
    assert abs(got[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    assert abs(got[3]["rrf_score"] - round(1 / 62, 6)) < 1e-9


def test_stickiness_ratio(spark):
    from metrics_advisor_spark.operators.sessions import stickiness

    # 3 users active day 0; only user 1 active day 1
    rows = [(u, _ts(100 + u)) for u in (1, 2, 3)]
    rows.append((1, _ts(86400 + 100)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: r for r in stickiness(ev, mau_days=7).collect()}
    d0 = min(got)
    assert got[d0]["dau"] == 3 and got[d0]["mau"] == 3
    assert got[d0 + 1]["dau"] == 1 and got[d0 + 1]["mau"] == 3
    assert abs(got[d0 + 1]["stickiness"] - round(1 / 3, 6)) < 1e-9


def test_interevent_gaps_quantiles(spark):
    from metrics_advisor_spark.operators.sessions import interevent_gaps

    # user 1: events at 0, 10, 30 → gaps 10, 20; user 2: single event
    rows = [(1, 1, _ts(0)), (1, 2, _ts(10)), (1, 3, _ts(30)), (2, 4, _ts(5))]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = interevent_gaps(ev).collect()[0]
    assert got["n_gaps"] == 2
    assert got["avg_s"] == 15.0
    assert got["max_s"] == 20
    assert got["p50_s"] == 15.0


def test_weekly_profile_epoch_dow(spark):
    from metrics_advisor_spark.operators.trend import weekly_profile

    # epoch 0 = Thursday 1970-01-01 00:00 UTC → dow (0+4)%7 = 4
    sig = spark.createDataFrame(
        [("m", "s", _ts(0), 1.0), ("m", "s", _ts(3 * 86400 + 3600), 5.0)],
        "metric string, series string, ts timestamp, value double",
    )
    got = {(r["dow"], r["hour"]): r for r in weekly_profile(sig).collect()}
    assert (4, 0) in got          # Thursday midnight
    assert (0, 1) in got          # Sunday 01:00 (3 days later)
    assert got[(0, 1)]["avg_value"] == 5.0


def test_benford_audit_shares_and_expectation(spark):
    from metrics_advisor_spark.operators.quality import benford_audit

    vals = [1.0, 12.0, 0.15, 190.0, 2.5, 0.0, -3.7]  # digits 1,1,1,1,2,-,3
    sig = spark.createDataFrame(
        [("m", "s", _ts(i), v) for i, v in enumerate(vals)],
        "metric string, series string, ts timestamp, value double",
    )
    got = {r["digit"]: r for r in benford_audit(sig).collect()}
    assert got[1]["n"] == 4 and got[2]["n"] == 1 and got[3]["n"] == 1
    assert abs(got[1]["share"] - round(4 / 6, 6)) < 1e-9
    assert abs(got[1]["expected"] - round(math.log10(2), 6)) < 1e-9
    assert 0 not in got  # zero has no significant digit


def test_ks_drift_detects_shift(spark):
    from metrics_advisor_spark.operators.quality import ks_drift

    rows = []
    for i in range(100):
        v = float(i % 10)
        rows.append(("stable", _ts(i * 60), v))
        rows.append(("shifted", _ts(i * 60), v + (0.0 if i < 50 else 100.0)))
    sig = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    got = {r["metric"]: r for r in ks_drift(sig).collect()}
    assert got["stable"]["ks"] < 0.05
    assert got["shifted"]["ks"] == 1.0  # disjoint supports
    assert got["shifted"]["n_ref"] == 50 and got["shifted"]["n_cur"] == 50
