"""Degenerate-input robustness for the round-4 operator families:
empty frames, single rows, constant values — no crashes, sane output."""

from __future__ import annotations

from datetime import datetime, timezone


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _sig(spark, rows):
    return spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )


def test_psi_ks_constant_metric(spark):
    """A constant metric: every cut equal, all mass in one bin — PSI
    and KS must be exactly 0, not NaN/crash."""
    from metrics_advisor_spark.operators.quality import ks_drift, psi_drift

    rows = [("c", "s", _ts(i * 60), 5.0) for i in range(40)]
    sig = _sig(spark, rows)
    p = psi_drift(sig).collect()[0]
    assert p["psi"] == 0.0
    k = ks_drift(sig).collect()[0]
    assert k["ks"] == 0.0


def test_theil_sen_and_mk_single_slot(spark):
    """One slot → zero pairs → the metric simply emits no row."""
    from metrics_advisor_spark.operators.trend import mann_kendall, theil_sen

    hourly = spark.createDataFrame(
        [("m", 0, 1.0)], "metric string, slot_epoch long, value double"
    )
    assert theil_sen(hourly).count() == 0
    assert mann_kendall(hourly).count() == 0


def test_spearman_constant_metric_dropped(spark):
    """A zero-variance metric has undefined rank correlation — pairs
    involving it are filtered, not NaN."""
    from metrics_advisor_spark.operators.trend import spearman_corr

    rows = []
    for h in range(10):
        rows.append(("var", h * 3600, float(h)))
        rows.append(("const", h * 3600, 1.0))
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = spearman_corr(hourly).collect()
    assert got == []


def test_rfm_single_user(spark):
    from metrics_advisor_spark.operators.sessions import rfm_segments

    ev = spark.createDataFrame(
        [(1, _ts(100), 5.0)], "user_id long, ts timestamp, value double"
    )
    got = rfm_segments(ev).collect()
    assert len(got) == 1 and got[0]["n_users"] == 1


def test_adamic_and_coeff_empty_edges(spark):
    from metrics_advisor_spark.functions.graph import (
        adamic_adar,
        clustering_coeff,
    )

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert adamic_adar(empty).count() == 0
    row = clustering_coeff(empty).collect()[0]
    assert row["n_edges"] == 0 and row["global_coeff"] is None


def test_cms_join_size_empty_counts(spark):
    from metrics_advisor_spark.functions.sketch import cms_join_size

    empty = spark.createDataFrame([], "k long, n long")
    got = cms_join_size(empty, empty, "k", "n").collect()[0]
    assert got["exact_join_size"] is None or got["exact_join_size"] == 0


def test_conversion_latency_no_conversions(spark):
    """Nobody converts → one row, zero count, NULL quantiles."""
    from metrics_advisor_spark.operators.sessions import conversion_latency

    ev = spark.createDataFrame(
        [(1, _ts(0), "view")], "user_id long, ts timestamp, event_type string"
    )
    got = conversion_latency(ev).collect()[0]
    assert got["n_converted"] == 0
    assert got["p50_s"] is None


def test_alert_episodes_quiet_stream(spark):
    """No anomalies → no episodes, not an error."""
    from metrics_advisor_spark.operators.trend import alert_episodes

    rows = [("m", "s", _ts(h * 3600), 10.0) for h in range(24)]
    assert alert_episodes(_sig(spark, rows)).count() == 0


def test_weighted_quantile_single_row(spark):
    from metrics_advisor_spark.functions.curation import weighted_quantile

    df = spark.createDataFrame(
        [("g", 7.0, 3)], "source string, v double, wt long"
    )
    got = weighted_quantile(df, "v", "wt", "source").collect()[0]
    assert got["wq50"] == 7.0 and got["total_weight"] == 3.0


def test_unigram_surprisal_empty_docs_dropped(spark):
    from metrics_advisor_spark.functions.text import unigram_surprisal

    docs = spark.createDataFrame(
        [(1, ""), (2, "word")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    assert 1 not in got           # no tokens → no row
    assert got[2]["surprisal"] == 0.0  # the only token: p=1 → −ln 1


def test_seasonal_decompose_short_series_empty(spark):
    """Fewer slots than a full trend window → nothing qualifies."""
    from metrics_advisor_spark.operators.trend import seasonal_decompose

    hourly = spark.createDataFrame(
        [("m", h * 3600, float(h)) for h in range(10)],
        "metric string, slot_epoch long, value double",
    )
    assert seasonal_decompose(hourly).count() == 0
