"""Gap fill and sessionization operators on hand-built ground truth."""

from __future__ import annotations

import numpy as np

from metrics_advisor_spark.operators.resample import fill_gaps
from metrics_advisor_spark.operators.sessions import session_stats, sessionize

from conftest import epoch_dt

T0 = 1640588400  # aligned to 15 s and 60 s boundaries


def _signals(spark, rows):
    return spark.createDataFrame(
        [("m", "s", epoch_dt(t), v) for t, v in rows],
        "metric string, series string, ts timestamp, value double",
    )


def test_fill_gaps_ffill(spark):
    df = _signals(spark, [(T0, 1.0), (T0 + 180, 4.0)])  # 60s grid, 2 gaps
    got = {
        int(r["ts"].timestamp()): r["value"]
        for r in fill_gaps(df, 60, method="ffill").collect()
    }
    assert got == {T0: 1.0, T0 + 60: 1.0, T0 + 120: 1.0, T0 + 180: 4.0}


def test_fill_gaps_null_and_zero(spark):
    df = _signals(spark, [(T0, 1.0), (T0 + 120, 3.0)])
    null_vals = {
        int(r["ts"].timestamp()): r["value"]
        for r in fill_gaps(df, 60, method="null").collect()
    }
    assert null_vals[T0 + 60] is None
    zero_vals = {
        int(r["ts"].timestamp()): r["value"]
        for r in fill_gaps(df, 60, method="zero").collect()
    }
    assert zero_vals[T0 + 60] == 0.0


def test_sessionize_gap_splits(spark):
    rows = [
        (T0, 1.0), (T0 + 60, 1.0), (T0 + 120, 1.0),      # session 0
        (T0 + 4000, 2.0), (T0 + 4060, 2.0),              # session 1 (gap>1800)
        (T0 + 9000, 3.0),                                # session 2
    ]
    got = {
        int(r["ts"].timestamp()): r["session_id"]
        for r in sessionize(_signals(spark, rows), gap_seconds=1800).collect()
    }
    assert got[T0] == got[T0 + 60] == got[T0 + 120] == 0
    assert got[T0 + 4000] == got[T0 + 4060] == 1
    assert got[T0 + 9000] == 2


def test_session_stats(spark):
    rows = [(T0, 1.0), (T0 + 60, 2.0), (T0 + 4000, 5.0)]
    stats = {
        r["session_id"]: (r["n_events"], r["duration_s"], r["total_value"])
        for r in session_stats(
            _signals(spark, rows), gap_seconds=1800
        ).collect()
    }
    assert stats[0] == (2, 60, 3.0)
    assert stats[1] == (1, 0, 5.0)


def test_sessionize_keys_isolated(spark):
    df = spark.createDataFrame(
        [
            ("m", "a", epoch_dt(T0), 1.0),
            ("m", "b", epoch_dt(T0 + 10**6), 1.0),  # far later, other key
        ],
        "metric string, series string, ts timestamp, value double",
    )
    got = {r["series"]: r["session_id"] for r in sessionize(df).collect()}
    assert got == {"a": 0, "b": 0}  # each key starts its own session 0
