"""P1–P7 detection operators (SURVEY.md §2.6) — known-answer goldens."""

import numpy as np
from pyspark.sql import functions as F

from metrics_advisor_spark.operators import (
    detect_anomalies,
    smooth_median,
)
from metrics_advisor_spark.operators.detect import (
    e_divisive_np,
    ksigma_outliers,
    ksigma_outliers_np,
    moving_median_np,
    stl_outliers_np,
)
from tests.conftest import make_signals_df


def test_moving_median_interior_and_edges():
    x = np.array([1.0, 2.0, 3.0, 4.0, 100.0, 6.0, 7.0, 8.0, 9.0])
    out = moving_median_np(x, 5)
    # interior: spike suppressed
    assert out[4] == 6.0
    # edges shrink the window (min_periods=1)
    assert out[0] == np.median([1.0, 2.0, 3.0])
    assert out[-1] == np.median([7.0, 8.0, 9.0])


def test_e_divisive_two_steps_exact():
    rng = np.random.default_rng(42)
    x = np.concatenate([np.zeros(160), 3 * np.ones(160), 7 * np.ones(160)])
    x = x + rng.normal(0, 0.1, x.size)
    cps = e_divisive_np(x, pvalue=0.05, permutations=100, seed=1)
    assert cps == [160, 320]


def test_e_divisive_noise_finds_nothing():
    rng = np.random.default_rng(3)
    assert e_divisive_np(rng.normal(0, 1, 400), permutations=100, seed=9) == []


def test_e_divisive_deterministic():
    rng = np.random.default_rng(5)
    x = np.concatenate([np.zeros(100), np.ones(100)]) + rng.normal(0, 0.2, 200)
    a = e_divisive_np(x, seed=123)
    b = e_divisive_np(x, seed=123)
    assert a == b


def test_ksigma_spike_detected():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 500)
    x[250] = 30.0
    idx = ksigma_outliers_np(x, 3.0)
    assert 250 in idx


def test_stl_outliers_spike_on_seasonal_signal():
    # spike riding a slow sine: detrend+deseasonalize must expose it
    t = np.arange(480)
    x = 10 * np.sin(2 * np.pi * t / 480) + np.random.default_rng(1).normal(0, 0.1, 480)
    x[300] += 5.0
    idx = stl_outliers_np(x)
    assert 300 in idx


def test_detect_anomalies_spark_step_and_spike(spark):
    rng = np.random.default_rng(7)
    step = np.where(np.arange(480) >= 200, 5.0, 0.0) + rng.normal(0, 0.05, 480)
    spike = rng.normal(0, 0.2, 480)
    spike[100] = 50.0
    df = make_signals_df(spark, {("m_step", "a"): step, ("m_spike", "b"): spike})
    out = detect_anomalies(df, cp_permutations=50).collect()
    cp_idx = [r["idx"] for r in out if r["metric"] == "m_step" and r["kind"] == "changepoint"]
    assert any(abs(i - 200) <= 2 for i in cp_idx)
    out_idx = [r["idx"] for r in out if r["metric"] == "m_spike" and r["kind"] == "outlier"]
    assert 100 in out_idx


def test_smooth_median_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, 60)
    df = make_signals_df(spark, {("m", "s"): x})
    got = np.array(
        [r["smoothed"] for r in smooth_median(df, 5).orderBy("ts").collect()]
    )
    np.testing.assert_allclose(got, moving_median_np(x, 5), rtol=1e-12)


def test_ksigma_outliers_spark_matches_numpy(spark):
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 300)
    x[50] = 25.0
    x[200] = -30.0
    df = make_signals_df(spark, {("m", "s"): x})
    got = sorted(
        int((F.unix_timestamp("ts"), r["ts"].timestamp() - 1640588307)[1] / 15)
        for r in ksigma_outliers(df, 3.0).collect()
    )
    want = sorted(ksigma_outliers_np(x, 3.0).tolist())
    assert got == want


def test_detection_long_series_chunked(spark):
    """The O(n²) energy statistic stays bounded via max_points chunking:
    a 20k-sample series completes and finds the step near its true spot."""
    import numpy as np
    import time

    n = 20_000
    rng = np.random.default_rng(17)
    vals = np.concatenate(
        [rng.normal(0, 0.1, n // 2), rng.normal(10, 0.1, n // 2)]
    )
    df = make_signals_df(spark, {("long", "s"): vals})
    t0 = time.time()
    rows = detect_anomalies(
        df, cp_permutations=20, max_points=2048
    ).filter(F.col("kind") == "changepoint").collect()
    assert time.time() - t0 < 240
    assert rows, "expected a change point on a 10-sigma step"
    # the step at index n/2 falls inside chunk [8192, 10240); the found
    # point must be within that chunk's span of the true location
    assert any(abs(r["idx"] - n // 2) <= 2048 for r in rows)
    assert any(abs(r["idx"] - n // 2) <= 16 for r in rows)
