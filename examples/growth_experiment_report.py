"""Growth & experimentation report — the round-4 journey/experiment
surface end to end.

Usage:  python examples/growth_experiment_report.py [sf_dir]

What a growth team asks of an events feed, in one pass: engagement
(DAU/WAU stickiness, day-N retention, cumulative LTV), behavior
structure (inter-event gaps, per-user entropy, top session paths,
conversion latency), customer value (RFM grid), experiment readouts
(A/A z-scores, then the CUPED variance-reduced form), and operational
guards (weekly profile, SLO burn, alert episodes, event throttling) —
every stage a contract-tested operator from the package.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.operators import (
    ab_test_zscores,
    alert_episodes,
    conversion_latency,
    cuped_ab,
    event_throttle,
    interevent_gaps,
    ltv_curve,
    path_trigrams,
    retention_curve,
    rfm_segments,
    slo_burn,
    stickiness,
    user_entropy,
    weekly_profile,
)
from metrics_advisor_spark.sources.signals import signals_from_events


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_growth")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    signals = signals_from_events(spark, sf_dir)

    print("=== Engagement ===")
    print("stickiness (DAU / 7-day actives), first days:")
    stickiness(events, mau_days=7).orderBy("day").show(5)
    print("day-N retention:")
    retention_curve(events, max_days=7).orderBy("day_n").show()
    print("cumulative LTV per user:")
    ltv_curve(events, max_days=7).orderBy("day_n").show()

    print("=== Behavior ===")
    print("inter-event gap distribution:")
    interevent_gaps(events).show()
    print("behavioral entropy (most/least habitual):")
    ue = user_entropy(events)
    ue.orderBy("entropy").show(3)
    ue.orderBy(ue.entropy.desc()).show(3)
    print("top in-session 3-step paths:")
    path_trigrams(events, top_k=5).show()
    print("view → purchase conversion latency:")
    conversion_latency(events).show()

    print("=== Customer value (RFM grid, top segments) ===")
    segs = rfm_segments(events, n_tiles=5)
    segs.orderBy(segs.n_users.desc()).show(5)

    print("=== Experiment readout (A/A on null data) ===")
    print("raw two-sample z per event type (|z| should be small):")
    ab_test_zscores(events).show()
    print("CUPED variance-reduced readout:")
    cuped_ab(events).show()

    print("=== Operational guards ===")
    print("hour-of-week profile (busiest cells):")
    wp = weekly_profile(signals)
    wp.orderBy(wp.n_events.desc()).show(5)
    print("rolling 6h SLO burn (worst hours):")
    burn = slo_burn(events, slo=0.05, window_hours=6)
    burn.orderBy(burn.burn_rate.desc()).show(5)
    print("alert episodes (2-sigma hourly, debounced):")
    alert_episodes(signals).orderBy("metric", "ep_start").show(5)
    print("throttling audit (60s bursts):")
    event_throttle(events, tolerance_s=60).show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
