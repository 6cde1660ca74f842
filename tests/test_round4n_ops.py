"""Round-4n operators: cohort conversion, period detection, max
drawdown, peak detection, ECDF sampling."""

from __future__ import annotations

import math
from datetime import datetime, timezone


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_cohort_conversion_rates(spark):
    from metrics_advisor_spark.operators.sessions import cohort_conversion

    week = 7 * 86400
    rows = [
        # cohort 0: user 1 converts, user 2 doesn't, user 3's purchase
        # PRECEDES the first view — not a conversion
        (1, _ts(0), "view"), (1, _ts(100), "purchase"),
        (2, _ts(0), "view"),
        (3, _ts(10), "purchase"), (3, _ts(20), "view"),
        # cohort 1: user 4 converts
        (4, _ts(week + 10), "view"), (4, _ts(week + 20), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {r["cohort"]: r for r in cohort_conversion(ev).collect()}
    assert got[0]["n_users"] == 3 and got[0]["n_converted"] == 1
    assert abs(got[0]["conversion_rate"] - round(1 / 3, 6)) < 1e-9
    assert got[1]["n_converted"] == 1 and got[1]["conversion_rate"] == 1.0


def test_period_detect_finds_daily_cycle(spark):
    from metrics_advisor_spark.operators.trend import period_detect

    rows = [
        ("m", h * 3600, math.sin(2 * math.pi * h / 24))
        for h in range(24 * 8)
    ]
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = period_detect(hourly, max_lag=48).collect()[0]
    assert got["period_slots"] == 24
    assert got["peak_acf"] > 0.95


def test_max_drawdown_known_path(spark):
    from metrics_advisor_spark.operators.trend import max_drawdown

    path = [10.0, 20.0, 5.0, 15.0, 30.0, 18.0]  # worst: 20 → 5
    hourly = spark.createDataFrame(
        [("m", h * 3600, v) for h, v in enumerate(path)],
        "metric string, slot_epoch long, value double",
    )
    got = max_drawdown(hourly).collect()[0]
    assert got["max_drawdown"] == 15.0
    assert abs(got["max_drawdown_rel"] - 0.75) < 1e-9


def test_peak_detect_strict_local_max(spark):
    from metrics_advisor_spark.operators.trend import peak_detect

    vals = [10.0] * 20
    vals[5] = 100.0           # isolated spike → peak
    vals[10] = 100.0
    vals[11] = 100.0          # plateau — NOT a strict local max
    hourly = spark.createDataFrame(
        [("m", h * 3600, v) for h, v in enumerate(vals)],
        "metric string, slot_epoch long, value double",
    )
    got = peak_detect(hourly, n_sigmas=2.0).collect()
    assert [r["slot_epoch"] // 3600 for r in got] == [5]


def test_ecdf_sample_endpoints_and_monotone(spark):
    from metrics_advisor_spark.operators.trend import ecdf_sample

    rows = [("m", "s", _ts(i), float(i)) for i in range(101)]
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = sorted(ecdf_sample(sig).collect(), key=lambda r: r["i"])
    assert len(got) == 21
    assert got[-1]["cdf"] == 1.0
    cdfs = [r["cdf"] for r in got]
    assert cdfs == sorted(cdfs)          # monotone
    assert abs(got[10]["cdf"] - 0.504950) < 1e-6  # 51/101 at midpoint


def test_wow_change_known_ratio(spark):
    from metrics_advisor_spark.operators.trend import wow_change

    week = 604800
    rows = []
    for i in range(7):
        rows.append(("m", "s", _ts(i * 86400), 10.0))          # week 0: 70
    for i in range(7):
        rows.append(("m", "s", _ts(week + i * 86400), 15.0))   # week 1: 105
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = {r["week"]: r for r in wow_change(sig).collect()}
    assert got[0]["prev_total"] is None and got[0]["wow_pct"] is None
    assert got[1]["prev_total"] == 70.0
    assert abs(got[1]["wow_pct"] - 0.5) < 1e-9


def test_grid_completeness_counts_holes(spark):
    from metrics_advisor_spark.operators.trend import grid_completeness

    # hours 0..9 with hours 3 and 7 missing → 8 of 10 slots
    rows = [("m", "s", _ts(h * 3600 + 5), 1.0)
            for h in range(10) if h not in (3, 7)]
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = grid_completeness(sig).collect()[0]
    assert got["n_present"] == 8 and got["n_expected"] == 10
    assert abs(got["completeness"] - 0.8) < 1e-9
