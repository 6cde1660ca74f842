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
