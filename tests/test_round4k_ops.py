"""Round-4k operators: seasonal z-score, anomaly co-occurrence, daily
quantiles, term burstiness, session summary, quantile alignment."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_seasonal_zscore_ignores_weekly_peak(spark):
    from metrics_advisor_spark.operators.trend import seasonal_zscore

    # 4 weeks of data: every Sunday-00 hour runs at 100, everything
    # else at 10.  A TRUE anomaly is planted in week 3 at Monday-05.
    rows = []
    week = 7 * 86400
    for w in range(4):
        for h in range(0, 7 * 24, 6):  # every 6 hours
            t = w * week + h * 3600
            dow_hour = (t // 86400 + 4) % 7, (t % 86400) // 3600
            v = 100.0 if dow_hour == (0, 0) else 10.0
            if w == 3 and dow_hour == (1, 6):
                v = 500.0  # the real incident
            rows.append(("m", "s", _ts(t), v))
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    # 1.5σ: the incident sits in ITS OWN cell's baseline (4 samples,
    # one extreme) so σ is inflated by the incident itself — the 3σ
    # form needs longer history; the cell-relative CLAIM is what the
    # test pins (weekly peak never fires, incident does)
    got = seasonal_zscore(sig, n_sigmas=1.5).collect()
    assert len(got) == 1
    assert got[0]["value"] == 500.0
    assert (got[0]["dow"], got[0]["hour"]) == (1, 6)


def test_anomaly_cooccurrence_joint_incidents(spark):
    from metrics_advisor_spark.operators.trend import anomaly_cooccurrence

    rows = []
    for h in range(50):
        for m in ("a", "b", "c"):
            v = 10.0
            # a and b spike together at hours 10, 20; c never spikes
            if m in ("a", "b") and h in (10, 20):
                v = 1000.0
            rows.append((m, "s", _ts(h * 3600), v))
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = anomaly_cooccurrence(sig, n_sigmas=2.0).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["metric_a"], r["metric_b"]) == ("a", "b")
    assert r["n_common"] == 2 and r["jaccard"] == 1.0


def test_daily_quantiles_shape(spark):
    from metrics_advisor_spark.operators.trend import daily_quantiles

    rows = [("m", "s", _ts(i * 600), float(i % 10)) for i in range(288)]
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = daily_quantiles(sig).collect()
    assert len(got) == 2  # two days of 10-min samples
    for r in got:
        assert r["p50"] <= r["p95"] <= r["p99"]
        assert r["n"] == 144


def test_term_burstiness_content_vs_function(spark):
    from metrics_advisor_spark.functions.text import term_burstiness

    # 'the' appears once per doc (function-word profile); 'cats'
    # repeats within its docs (bursty content word)
    docs = spark.createDataFrame(
        [
            (1, "the cats cats cats run"),
            (2, "the dogs sleep"),
            (3, "the cats cats nap"),
            (4, "the birds fly"),
        ],
        "doc_id long, text string",
    )
    got = {r["term"]: r for r in term_burstiness(docs, top_k=10).collect()}
    assert got["the"]["burstiness"] == 0.0
    assert got["cats"]["burstiness"] == 1.0
    assert got["the"]["rank"] == 1  # highest df


def test_session_summary_bounce(spark):
    from metrics_advisor_spark.operators.sessions import session_summary

    rows = [
        # series A: one 3-event session + one bounce far later
        ("m", "A", _ts(0), 1.0), ("m", "A", _ts(60), 1.0),
        ("m", "A", _ts(120), 1.0), ("m", "A", _ts(99999), 1.0),
        # series B: single bounce
        ("m", "B", _ts(0), 1.0),
    ]
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = session_summary(sig).collect()[0]
    assert got["n_sessions"] == 3
    assert abs(got["bounce_rate"] - round(2 / 3, 6)) < 1e-9
    assert got["p90_depth"] >= 2


def test_quantile_align_identity_for_identical_groups(spark):
    from metrics_advisor_spark.operators.normalize import quantile_align

    rows = []
    for i in range(100):
        rows.append((i, "s1", i % 50))
        rows.append((1000 + i, "s2", i % 50))       # same distribution
        rows.append((2000 + i, "s3", (i % 50) * 10))  # stretched
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = quantile_align(df, "n_chars", "source").collect()
    s1 = {r["pct"]: r for r in got if r["source"] == "s1"}
    s3 = {r["pct"]: r for r in got if r["source"] == "s3"}
    # s1 matches its own marginal less than the pooled reference, but
    # is monotone and bounded by it; s3 sits far above the reference
    assert all(s1[p]["group_value"] <= s1[p]["ref_value"] + 1e-9 for p in s1)
    assert all(s3[p]["group_value"] >= s3[p]["ref_value"] - 1e-9 for p in s3)
    assert len(got) == 27  # 3 sources × 9 interior deciles
