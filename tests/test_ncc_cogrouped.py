"""P8 option (b): cogrouped-pandas ncc agrees with the SQL plans."""

from __future__ import annotations

import numpy as np

from metrics_advisor_spark.operators.xcorr import (
    bucket_correlation,
    ncc_cogrouped,
)

from conftest import make_signals_df

T0 = 1640588307


def _collect(df):
    return {
        (r["bucket_id"], r["obj_metric"], r["cand_metric"], r["lag"]): (
            round(r["corr"], 9),
            r["n_pairs"],
        )
        for r in df.collect()
    }


def test_cogrouped_matches_sql_plan_on_regular_grid(spark):
    """On a gap-free grid, positional and timestamp alignment coincide —
    the cogrouped UDF must agree with the corr()-aggregate plan at every
    (bucket, pair, lag)."""
    rng = np.random.default_rng(21)
    n = 120
    obj = make_signals_df(spark, {("o", "s"): rng.normal(0, 1, n)}, t0=T0)
    cand = make_signals_df(
        spark,
        {("c1", "s"): rng.normal(0, 1, n), ("c2", "s"): rng.normal(5, 2, n)},
        t0=T0,
    )
    sql_plan = _collect(
        bucket_correlation(
            obj, cand, tmin=T0, bucket_seconds=600, lag_max=3, step_seconds=15
        )
    )
    udf_plan = _collect(
        ncc_cogrouped(obj, cand, tmin=T0, bucket_seconds=600, lag_max=3)
    )
    assert set(udf_plan) == set(sql_plan)
    for k, (corr_u, n_u) in udf_plan.items():
        corr_s, n_s = sql_plan[k]
        assert n_u == n_s, k
        assert abs(corr_u - corr_s) < 1e-9, k


def test_cogrouped_finds_planted_lag(spark):
    """A candidate that lags the objective by 2 samples peaks at lag=+2."""
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, 40)
    lagged = np.roll(base, 2)  # cand[i] = base[i-2] → peak at lag -2...
    obj = make_signals_df(spark, {("o", "s"): base}, t0=T0)
    cand = make_signals_df(spark, {("c", "s"): lagged}, t0=T0)
    rows = ncc_cogrouped(
        obj, cand, tmin=T0, bucket_seconds=600, lag_max=3
    ).collect()
    best = max(rows, key=lambda r: abs(r["corr"]))
    assert best["lag"] == 2
    assert abs(best["corr"]) > 0.95
