"""T1–T5 time bucketing (SURVEY.md §2.3)."""

import numpy as np
from pyspark.sql import functions as F

from metrics_advisor_spark.operators import time_extent, with_bucket_id
from metrics_advisor_spark.operators.buckets import n_buckets
from tests.conftest import make_signals_df

T0 = 1640588307


def test_time_extent(spark):
    df = make_signals_df(spark, {("m", "a"): np.arange(480.0)}, t0=T0, step=15)
    tmin, tmax = time_extent(df)
    assert tmin == T0
    assert tmax == T0 + 15 * 479


def test_reference_bucket_count():
    # FIXTURES.md §5 golden: span 1640588307..1640595492 → 480 slots → 13 buckets
    assert n_buckets(1640588307, 1640595492, 15, 40) == 13


def test_bucket_assignment_floor_formula(spark):
    df = make_signals_df(spark, {("m", "a"): np.arange(480.0)}, t0=T0, step=15)
    out = with_bucket_id(df, T0, 600)
    # sample i sits at T0+15i → bucket 15i//600 = i//40
    bad = out.filter(
        F.col("bucket_id") != F.floor((F.unix_timestamp("ts") - T0) / 600)
    ).count()
    assert bad == 0
    got = dict(
        (r["bucket_id"], r["cnt"])
        for r in out.groupBy("bucket_id").agg(F.count("*").alias("cnt")).collect()
    )
    assert got == {i: 40 for i in range(12)}
