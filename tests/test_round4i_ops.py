"""Round-4i operators: CUPED A/B, table diff, seasonal decomposition,
clustering coefficient, event throttling, retention curve, tokenizer
fertility."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_cuped_reduces_variance(spark):
    """Pre-period level differences between users inflate raw outcome
    variance; CUPED removes exactly that component on correlated
    pre/post data."""
    from metrics_advisor_spark.operators.experiments import cuped_ab

    rows = []
    # 40 users, each with a stable personal level u*10; pre events in
    # the first half, post events (same level + tiny delta) after.
    for u in range(1, 41):
        level = float(u * 10)
        rows.append((u, _ts(100 + u), level))            # pre
        rows.append((u, _ts(100000 + u), level + 1.0))   # post
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = cuped_ab(ev).collect()[0]
    assert got["n_a"] + got["n_b"] == 40
    # pre and post are perfectly correlated → theta ≈ 1, variance ≈ gone
    assert abs(got["theta"] - 1.0) < 1e-6
    # perfect correlation → adjusted variance collapses to ~0; z_cuped
    # may be NULL (0/0 SE) — the variance-reduction number is the claim
    assert got["var_reduction"] > 0.999
    assert got["z_raw"] is not None


def test_table_diff_statuses(spark):
    from metrics_advisor_spark.operators.history import table_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "event_id long, event_type string, value double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 99.0), (4, "d", 4.0)],
        "event_id long, event_type string, value double",
    )
    got = {r["status"]: r["n_rows"] for r in table_diff(
        old, new, ("event_id",), ("event_type", "value")).collect()}
    assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_seasonal_decompose_recovers_components(spark):
    from metrics_advisor_spark.operators.trend import seasonal_decompose

    # value = 0.5·h (trend) + [10 if hour-of-day == 0] (seasonal)
    rows = []
    for h in range(24 * 6):
        seasonal = 10.0 if h % 24 == 0 else 0.0
        rows.append(("m", h * 3600, 0.5 * h + seasonal))
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    out = seasonal_decompose(hourly).collect()
    assert len(out) > 0
    by_phase0 = [r for r in out if (r["slot_epoch"] // 3600) % 24 == 0]
    by_phase12 = [r for r in out if (r["slot_epoch"] // 3600) % 24 == 12]
    s0 = sum(r["seasonal"] for r in by_phase0) / len(by_phase0)
    s12 = sum(r["seasonal"] for r in by_phase12) / len(by_phase12)
    # phase-0 seasonal sits ~10 above the off-peak phases
    assert s0 - s12 > 8.0
    # residuals are small once trend+seasonal explain the series
    assert max(abs(r["resid"]) for r in out) < 2.0


def test_clustering_coeff_triangle_vs_path(spark):
    from metrics_advisor_spark.functions.graph import clustering_coeff

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "doc_a long, doc_b long"
    )
    got = clustering_coeff(tri).collect()[0]
    assert got["n_triangles"] == 1 and got["n_wedges"] == 3
    assert got["global_coeff"] == 1.0
    path = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = clustering_coeff(path).collect()[0]
    assert got["n_triangles"] == 0 and got["global_coeff"] == 0.0


def test_event_throttle_burst_collapse(spark):
    from metrics_advisor_spark.operators.sessions import event_throttle

    rows = [
        # user 1 'click': burst at 0,10,20 (one kept) + lone event at 500
        (1, 1, _ts(0), "click"), (1, 2, _ts(10), "click"),
        (1, 3, _ts(20), "click"), (1, 4, _ts(500), "click"),
        # slow chain 0,50,100,150 — gaps ≤ 60 so ONE island
        (2, 5, _ts(0), "view"), (2, 6, _ts(50), "view"),
        (2, 7, _ts(100), "view"), (2, 8, _ts(150), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {r["event_type"]: r for r in event_throttle(ev, 60).collect()}
    assert got["click"]["n_kept"] == 2 and got["click"]["n_dropped"] == 2
    assert got["view"]["n_kept"] == 1 and got["view"]["n_dropped"] == 3


def test_retention_curve_shares(spark):
    from metrics_advisor_spark.operators.sessions import retention_curve

    day = 86400
    rows = [
        (1, _ts(0)), (1, _ts(day)), (1, _ts(3 * day)),
        (2, _ts(0)),
        (3, _ts(day)), (3, _ts(2 * day)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day_n"]: r for r in retention_curve(ev).collect()}
    assert got[0]["n_active"] == 3 and got[0]["retention"] == 1.0
    assert got[1]["n_active"] == 2          # users 1 and 3
    assert abs(got[1]["retention"] - round(2 / 3, 6)) < 1e-9
    assert got[3]["n_active"] == 1


def test_tokenizer_fertility_counts(spark):
    from metrics_advisor_spark.functions.text import tokenizer_fertility

    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s1"), (2, "a-b c", "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    got = tokenizer_fertility(docs).collect()[0]
    # doc1: 2 tokens / 2 words; doc2: "a","-","b","c" = 4 tokens / 2 words
    assert got["n_docs"] == 2
    assert got["n_tokens"] == 6
    assert abs(got["tokens_per_word"] - 1.5) < 1e-9
