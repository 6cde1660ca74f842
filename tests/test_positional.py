"""Q3 parity: positional window slicing vs timestamp alignment.

The reference slices correlation windows by sample position
(data[40i:40i+40]), so a series with a missing row drifts out of time
alignment.  positional_correlation reproduces that; the default
timestamp mode does not drift (documented deviation).
"""

from __future__ import annotations

import numpy as np

from metrics_advisor_spark import AdvisorConfig
from metrics_advisor_spark.operators.xcorr import (
    bucket_correlation,
    positional_correlation,
)
from metrics_advisor_spark.plans import analyze

from conftest import epoch_dt, make_signals_df


def _np_corr(a, b):
    return float(np.corrcoef(a, b)[0, 1])


def test_positional_matches_reference_slicing(spark):
    """Positional lag-0 corr per bucket == numpy corr of the positional
    slices, including for a series with a missing sample (the drift)."""
    rng = np.random.default_rng(5)
    n = 80
    obj_vals = rng.normal(0, 1, n)
    cand_vals = rng.normal(0, 1, n)
    obj = make_signals_df(spark, {("o", "s"): obj_vals})
    # drop candidate sample #10 → everything after shifts one position
    rows = [(float(v), i) for i, v in enumerate(cand_vals) if i != 10]
    cand = spark.createDataFrame(
        [("c", "s", epoch_dt(1640588307 + 15 * i), v) for v, i in rows],
        "metric string, series string, ts timestamp, value double",
    )
    got = {
        (r["bucket_id"], r["lag"]): (r["corr"], r["n_pairs"])
        for r in positional_correlation(
            obj, cand, count_bucket=40, lag_max=0
        ).collect()
    }
    cand_pos = np.array([v for v, _ in rows])  # positional (drifted) series
    for b in (0, 1):
        lo, hi = 40 * b, 40 * (b + 1)
        a = obj_vals[lo:hi]
        c = cand_pos[lo:hi] if hi <= cand_pos.size else cand_pos[lo:]
        m = min(a.size, c.size)
        want = _np_corr(a[:m], c[:m])
        corr, n_pairs = got[(b, 0)]
        assert n_pairs == m
        assert abs(corr - want) < 1e-9


def test_timestamp_mode_does_not_drift(spark):
    """With a missing sample, timestamp alignment pairs equal timestamps
    (39 pairs in the gap bucket) instead of drifting."""
    rng = np.random.default_rng(5)
    n = 80
    base = rng.normal(0, 1, n)
    obj = make_signals_df(spark, {("o", "s"): base})
    rows = [(float(v), i) for i, v in enumerate(base) if i != 10]
    cand = spark.createDataFrame(
        [("c", "s", epoch_dt(1640588307 + 15 * i), v) for v, i in rows],
        "metric string, series string, ts timestamp, value double",
    )
    got = {
        (r["bucket_id"], r["lag"]): (r["corr"], r["n_pairs"])
        for r in bucket_correlation(
            obj, cand, tmin=1640588307, bucket_seconds=600, lag_max=0,
            step_seconds=15,
        ).collect()
    }
    # bucket 0 lost one pair but stays perfectly aligned: corr == 1
    corr0, n0 = got[(0, 0)]
    assert n0 == 39
    assert abs(corr0 - 1.0) < 1e-9
    corr1, n1 = got[(1, 0)]
    assert n1 == 40
    assert abs(corr1 - 1.0) < 1e-9


def test_analyze_positional_flag_runs(spark):
    """The cfg flag routes the pipeline through positional windows."""
    rng = np.random.default_rng(9)
    n = 120
    obj = np.concatenate([np.full(60, 1.0), np.full(60, 9.0)])
    cand = np.concatenate([np.full(60, 3.0), np.full(60, 27.0)])
    df = make_signals_df(
        spark,
        {
            ("tidb_p99_rt:total", "agg_val"): obj + rng.normal(0, 0.05, n),
            ("tikv_cpu", "n1"): cand + rng.normal(0, 0.05, n),
        },
    )
    cfg = AdvisorConfig(cp_permutations=30, positional_windows=True)
    ranked = analyze(df, cfg).ranked.collect()
    assert ranked
    assert all(r["n_pairs"] <= 40 for r in ranked)
