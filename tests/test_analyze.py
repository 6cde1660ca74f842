"""End-to-end analysis plan (SURVEY.md §3.1) on synthetic ground truth."""

import numpy as np
from pyspark.sql import functions as F

from metrics_advisor_spark import AdvisorConfig
from metrics_advisor_spark.plans import analyze
from tests.conftest import make_signals_df

T0 = 1640588307


def test_analyze_finds_planted_correlation(spark):
    rng = np.random.default_rng(7)
    n = 480
    step = np.where(np.arange(n) >= 200, 5.0, 0.0) + rng.normal(0, 0.1, n)
    cand = np.roll(step, 2) + rng.normal(0, 0.05, n)  # lags obj by 2
    df = make_signals_df(spark, {
        ("tidb_p99_rt:total", "agg_val"): step,       # objective (F4 list)
        ("tikv_cpu:by_instance", "n1"): cand,         # correlated candidate
        ("flat", "x"): np.full(n, 1.0),               # F2: filtered out
        ("short", "y"): np.arange(5.0),               # S3: filtered out
    })
    res = analyze(df, AdvisorConfig(cp_permutations=50))

    assert (res.tmin, res.tmax) == (T0, T0 + 15 * 479)

    anom_metrics = {
        r["metric"] for r in res.anomalies.select("metric").distinct().collect()
    }
    assert "flat" not in anom_metrics and "short" not in anom_metrics

    # the step lands in bucket 200//40 == 5 for the objective
    obj_buckets = {
        r["bucket_id"]
        for r in res.membership.filter("is_obj").collect()
    }
    assert 5 in obj_buckets

    top = res.ranked.filter("rank = 1").collect()
    assert top, "expected at least one ranked correlation"
    for r in top:
        assert r["cand_metric"] == "tikv_cpu:by_instance"
        assert r["lag"] == 2
        assert abs(r["corr"]) > 0.7


def test_analyze_membership_deduped(spark):
    rng = np.random.default_rng(1)
    n = 480
    sig = np.where(np.arange(n) >= 120, 4.0, 0.0) + rng.normal(0, 0.1, n)
    df = make_signals_df(spark, {("tidb_p99_rt:total", "agg_val"): sig})
    res = analyze(df, AdvisorConfig(cp_permutations=50))
    dup = (
        res.membership.groupBy("bucket_id", "metric", "series")
        .agg(F.count("*").alias("c"))
        .filter("c > 1")
        .count()
    )
    assert dup == 0
