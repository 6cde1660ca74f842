"""End-to-end golden run against the reference's own dataset
(SURVEY.md §5 item 3, FIXTURES.md §5).

Reads /root/reference/metrics/full-index-lookup.tar.gz (read-only
fixture shipped with the reference repo) and checks the measured golden
facts: 50 metric CSVs, 156 series, global span 1640588307–1640595492,
13 buckets, objective metrics present, report renders.
"""

import pytest
from pyspark.sql import functions as F

from metrics_advisor_spark import AdvisorConfig
from metrics_advisor_spark.operators.buckets import n_buckets
from metrics_advisor_spark.plans import analyze
from metrics_advisor_spark.plans.report import render_markdown
from metrics_advisor_spark.sources import ingest_tar

BUNDLE = "/root/reference/metrics/full-index-lookup.tar.gz"


@pytest.fixture(scope="module")
def bundle_signals(spark):
    sig = ingest_tar(spark, BUNDLE).cache()
    yield sig
    sig.unpersist()


def test_ingest_golden_shape(bundle_signals):
    assert bundle_signals.select("metric").distinct().count() == 50
    assert bundle_signals.select("metric", "series").distinct().count() == 156
    row = bundle_signals.agg(
        F.min(F.unix_timestamp("ts")).alias("tmin"),
        F.max(F.unix_timestamp("ts")).alias("tmax"),
    ).first()
    assert (row["tmin"], row["tmax"]) == (1640588307, 1640595492)
    assert n_buckets(row["tmin"], row["tmax"]) == 13


def test_objectives_present(bundle_signals):
    cfg = AdvisorConfig()
    present = {
        r["metric"]
        for r in bundle_signals.select("metric").distinct().collect()
    }
    assert set(cfg.obj_signals) <= present


def test_full_pipeline_and_report(bundle_signals):
    cfg = AdvisorConfig(cp_permutations=30)
    res = analyze(bundle_signals, cfg)
    ranked = res.ranked.collect()
    assert ranked, "expected correlated candidates on the real bundle"
    assert all(1 <= r["rank"] <= 3 for r in ranked)
    assert all(-3 <= r["lag"] <= 3 for r in ranked)
    assert all(-1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9 for r in ranked)
    # every correlation window is at most one bucket of samples
    assert all(r["n_pairs"] <= 40 for r in ranked)
    md = render_markdown(res)
    assert "Time slice" in md and "top correlated candidates" in md
