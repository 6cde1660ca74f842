"""Bucketed tables: joins and aggregations on the bucket key skip the
shuffle (no Exchange in the physical plan)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metrics_advisor_spark.sources.warehouse import read_table, save_bucketed

from conftest import make_signals_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    rng = np.random.default_rng(2)
    a = make_signals_df(
        spark,
        {("m1", f"s{i}"): rng.normal(0, 1, 40) for i in range(8)},
    )
    b = make_signals_df(
        spark,
        {("m1", f"s{i}"): rng.normal(5, 1, 40) for i in range(8)},
    )
    save_bucketed(a, "sig_a", buckets=8)
    save_bucketed(b, "sig_b", buckets=8)
    yield "sig_a", "sig_b"
    spark.sql("DROP TABLE IF EXISTS sig_a")
    spark.sql("DROP TABLE IF EXISTS sig_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # join keys == bucket keys: that's the co-located contract.  (A
    # superset like (metric, series, ts) makes the planner fall back to
    # a plain shuffled scan — "Bucketed: false (disabled by query
    # planner)" — because the bucket layout can't satisfy the finer
    # required distribution.)
    ta, tb = bucketed_tables
    a = read_table(spark, ta)
    b = read_table(spark, tb).select(
        "metric", "series", F.col("ts").alias("ts_b"), F.col("value").alias("vb")
    )
    joined = a.hint("merge").join(b, ["metric", "series"])
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan
    assert joined.count() == 8 * 40 * 40  # per-key cross of both grids


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    ta, _ = bucketed_tables
    agg = (
        read_table(spark, ta)
        .groupBy("metric", "series")
        .agg(F.avg("value").alias("avg_value"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 8


def test_unbucketed_baseline_does_shuffle(spark):
    # sanity: the same join WITHOUT bucketing carries an Exchange
    rng = np.random.default_rng(3)
    a = make_signals_df(spark, {("m1", "x"): rng.normal(0, 1, 40)})
    b = make_signals_df(spark, {("m1", "x"): rng.normal(0, 1, 40)})
    joined = a.hint("merge").join(b, ["metric", "series", "ts"])
    assert "Exchange" in _plan(joined)


def test_date_partitioned_store_prunes(spark, tmp_path):
    from metrics_advisor_spark.sources.warehouse import (
        read_signals_partitioned,
        save_signals_partitioned,
    )

    rng = np.random.default_rng(4)
    # 3 days of data @ 1 sample/minute
    df = make_signals_df(
        spark, {("m1", "s"): rng.normal(0, 1, 3 * 24 * 60)},
        t0=1640563200, step=60,  # 2021-12-27 00:00 UTC, day-aligned
    )
    store = str(tmp_path / "sig_store")
    save_signals_partitioned(df, store)

    import os
    days = sorted(d for d in os.listdir(store) if d.startswith("sig_date="))
    assert days == [
        "sig_date=2021-12-27", "sig_date=2021-12-28", "sig_date=2021-12-29"
    ]

    one_day = read_signals_partitioned(
        spark, store, start_date="2021-12-28", end_date="2021-12-28"
    )
    plan = _plan(one_day)
    # the pruning predicate reaches the scan's PartitionFilters
    assert "sig_date" in plan.split("PartitionFilters")[1][:250], plan
    assert one_day.count() == 24 * 60
    assert read_signals_partitioned(spark, store).count() == 3 * 24 * 60
