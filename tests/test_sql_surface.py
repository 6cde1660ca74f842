"""SQL surface: partition-aware UDTFs match the DataFrame operators."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from metrics_advisor_spark.operators.detect import detect_anomalies
from metrics_advisor_spark.sql import register_all

from conftest import make_signals_df


def test_udtf_changepoints_match_dataframe_op(spark):
    rng = np.random.default_rng(13)
    series = {
        ("m1", "a"): np.concatenate([np.full(60, 1.0), np.full(60, 10.0)])
        + rng.normal(0, 0.05, 120),
        ("m2", "b"): rng.normal(5, 0.1, 120),  # no change point
    }
    df = make_signals_df(spark, series)
    register_all(spark, df)

    got = {
        (r["metric"], r["series"], int(r["ts"].timestamp()))
        for r in spark.sql(
            """
            SELECT * FROM ma_detect_changepoints(
                TABLE(SELECT * FROM signals)
                PARTITION BY (metric, series) ORDER BY ts)
            """
        ).collect()
    }
    want = {
        (r["metric"], r["series"], int(r["ts"].timestamp()))
        for r in detect_anomalies(df)
        .filter(F.col("kind") == "changepoint")
        .collect()
    }
    assert got == want
    assert got, "expected the step change to be detected"
    assert all(m == "m1" for m, _, _ in got)


def test_udtf_outliers_from_sql(spark):
    vals = np.ones(100)
    vals[50] = 50.0
    df = make_signals_df(spark, {("m", "s"): vals})
    register_all(spark, df)
    rows = spark.sql(
        """
        SELECT * FROM ma_detect_outliers(
            TABLE(SELECT * FROM signals)
            PARTITION BY (metric, series) ORDER BY ts)
        """
    ).collect()
    assert [r["idx"] for r in rows] == [50]
    assert rows[0]["value"] == 50.0


def test_relational_sql_over_signals_view(spark):
    df = make_signals_df(
        spark, {("m1", "a"): np.arange(30.0), ("m1", "b"): np.arange(30.0) * 2}
    )
    register_all(spark, df)
    rows = spark.sql(
        """
        SELECT series, count(*) AS n, round(avg(value), 6) AS avg_value
        FROM signals GROUP BY series ORDER BY series
        """
    ).collect()
    assert [(r["series"], r["n"]) for r in rows] == [("a", 30), ("b", 30)]


def test_analytics_views_sql_reachable(spark):
    """The analytics views answer plain SQL — hourly grid, sessions,
    and the user-day rollup — through the same Catalyst plans as the
    DataFrame API."""
    from metrics_advisor_spark.sql import register_analytics_views
    from metrics_advisor_spark.sources.signals import signals_from_events

    sf = "/root/testdata/sf0.001"
    signals = signals_from_events(spark, sf)
    events = spark.read.parquet(f"{sf}/events.parquet")
    register_analytics_views(spark, signals=signals, events=events)

    hourly = spark.sql(
        "SELECT metric, count(*) AS n FROM hourly GROUP BY 1"
    ).collect()
    assert len(hourly) > 0 and all(r["n"] > 0 for r in hourly)

    sess = spark.sql(
        "SELECT count(*) AS n, max(n_events) AS mx FROM sessions"
    ).collect()[0]
    assert sess["n"] > 0 and sess["mx"] >= 1

    ud = spark.sql(
        "SELECT count(*) AS n FROM user_daily WHERE n_events > 0"
    ).collect()[0]
    assert ud["n"] > 0

    # compose: top metric by hourly volatility, in one SQL statement
    vol = spark.sql("""
        SELECT metric, stddev_samp(value) AS sd
        FROM hourly GROUP BY 1 ORDER BY sd DESC, metric LIMIT 1
    """).collect()
    assert len(vol) == 1
