"""Metrics-observability report — the round-4 time-series surface end
to end.

Usage:  python examples/observability_report.py [sf_dir]

What an SRE asks of a fresh metrics feed, in one pass: load validation
(column profile + FK audit), hourly OHLC shape, gap interpolation
coverage, rate bursts, daily-seasonality strength, error↔click rolling
correlation, user journeys (sessions → transitions → funnel →
attribution), and robust per-series scaling — every stage a
contract-tested operator from the package.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.operators import (
    burst_detect,
    interval_merge,
    last_touch_attribution,
    ohlc,
    profile_columns,
    rolling_corr,
    seasonal_strength,
    transition_counts,
    winsorize,
)
from metrics_advisor_spark.operators.resample import interpolate_hourly
from metrics_advisor_spark.sources.signals import signals_from_events


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_observability")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    signals = signals_from_events(spark, sf_dir)

    print("== load validation ==")
    for r in profile_columns(
        events, numeric_cols=("event_id", "user_id", "value")
    ).collect():
        print(
            f"  {r['column_name']:11s} nulls={r['n_nulls']:<4d} "
            f"distinct={r['n_distinct']}"
        )

    print("== hourly OHLC (first 3 bars of 'error') ==")
    bars = (
        ohlc(signals.where(F.col('metric') == 'error'), 3600, ("metric",))
        .orderBy("slot_epoch")
        .limit(3)
        .collect()
    )
    for b in bars:
        print(
            f"  t={b['slot_epoch']} o={b['open']:.2f} h={b['high']:.2f} "
            f"l={b['low']:.2f} c={b['close']:.2f} n={b['n_ticks']}"
        )

    interp = interpolate_hourly(signals)
    n_filled = interp.where("is_interpolated").count()
    print(f"== gap fill == {n_filled} hourly slots interpolated")

    bursts = burst_detect(signals.drop("series"), 3600, 2.0)
    print(f"== bursts (>2σ hourly) == {bursts.count()} flagged buckets")

    hourly = signals.groupBy(
        "metric",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
        .cast("long")
        .alias("slot_epoch"),
    ).agg(F.avg("value").alias("value"))
    print("== daily seasonality (ratio < 1 ⇒ seasonal) ==")
    for r in seasonal_strength(hourly).collect():
        print(f"  {r['metric']:10s} ratio={r['strength_ratio']}")

    a = hourly.where("metric = 'error'").select(
        "slot_epoch", F.col("value").alias("va")
    )
    b = hourly.where("metric = 'click'").select(
        "slot_epoch", F.col("value").alias("vb")
    )
    rc = rolling_corr(a.join(b, "slot_epoch"), window_slots=24)
    ext = rc.agg(F.min("r"), F.max("r")).collect()[0]
    print(f"== rolling error↔click corr == range [{ext[0]}, {ext[1]}]")

    print("== user journeys ==")
    islands = interval_merge(events, gap_seconds=1800)
    print(f"  activity islands: {islands.count()}")
    top = (
        transition_counts(events, 1800)
        .orderBy(F.desc("n_transitions"))
        .limit(3)
        .collect()
    )
    for t in top:
        print(
            f"  {t['from_type']:9s}→ {t['to_type']:9s} "
            f"{t['n_transitions']} transitions"
        )
    for r in last_touch_attribution(events).collect():
        print(
            f"  purchase ← {r['touch_type']:9s} "
            f"n={r['n_conversions']} value={r['total_value']}"
        )

    clipped = winsorize(signals, 0.05, 0.95).where("was_clipped").count()
    print(f"== winsorize == {clipped} tail samples clipped")


if __name__ == "__main__":
    main(*sys.argv[1:2])
