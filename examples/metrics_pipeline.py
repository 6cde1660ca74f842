"""End-to-end metrics root-cause run on the driver testdata.

Usage:  python examples/metrics_pipeline.py [sf_dir]

Loads events → signals, detects anomalies (E-Divisive + k-sigma),
assigns 10-min buckets, correlates candidates against the 'error'
objective, and prints the ranked suspects — the same flow
`metrics-advisor` runs on its CSV bundles (see README Usage for the
CLI that consumes those directly).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_advisor_spark import AdvisorConfig, get_spark
from metrics_advisor_spark.operators.resample import resample
from metrics_advisor_spark.plans.analyze import analyze
from metrics_advisor_spark.sources.signals import signals_from_events

from pyspark.sql import functions as F

HOUR = 3600


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_metrics")
    sig = resample(
        signals_from_events(spark, sf_dir).withColumn("series", F.lit("all")),
        HOUR,
        "avg",
    )
    cfg = AdvisorConfig(
        obj_signals=("error",),
        sample_time_step=HOUR,
        count_bucket=48,
        min_range=1e-9,
        cp_permutations=50,
        sigma_level=2.0,
        cp_only_anomaly_ts=False,
    )
    for row in analyze(sig, cfg).ranked.limit(10).collect():
        print(row)


if __name__ == "__main__":
    main(*sys.argv[1:2])
