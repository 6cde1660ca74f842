"""S3 validity + F2 range gates (SURVEY.md §2.1/2.2)."""

import numpy as np

from metrics_advisor_spark.operators import range_filter, series_stats, valid_signals
from tests.conftest import make_signals_df


def test_valid_signals_drops_short_series(spark):
    df = make_signals_df(spark, {
        ("m_long", "a"): np.arange(30.0),
        ("m_short", "b"): np.arange(10.0),   # ≤20 rows → dropped
        ("m_exact", "c"): np.arange(20.0),   # exactly 20 → dropped (strict >)
    })
    kept = set(
        r["metric"] for r in valid_signals(df, 20).select("metric").distinct().collect()
    )
    assert kept == {"m_long"}


def test_range_filter_drops_near_constant(spark):
    df = make_signals_df(spark, {
        ("m_flat", "a"): np.full(30, 1.0),                  # range 0
        ("m_tiny", "b"): 1.0 + np.linspace(0, 0.005, 30),   # range == 0.005 → dropped
        ("m_live", "c"): np.linspace(0, 1, 30),
    })
    kept = set(
        r["metric"] for r in range_filter(df, 0.005).select("metric").distinct().collect()
    )
    assert kept == {"m_live"}


def test_series_stats_values(spark):
    df = make_signals_df(spark, {("m", "s"): np.array([1.0, 5.0, 3.0])})
    row = series_stats(df).first()
    assert row["n_samples"] == 3
    assert row["min_value"] == 1.0
    assert row["max_value"] == 5.0
    assert row["value_range"] == 4.0
