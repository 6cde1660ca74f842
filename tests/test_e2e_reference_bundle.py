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


def test_positional_parity_pipeline(bundle_signals):
    """Second e2e golden: parity Q3 mode (positional_windows=True slices
    correlation windows by sample POSITION, as the reference does at
    /root/reference/metrics_advisor.py:186-187).  Goldens measured on
    the bundle with the seeded detector (cp_permutations=30)."""
    cfg = AdvisorConfig(cp_permutations=30, positional_windows=True)
    res = analyze(bundle_signals, cfg)

    obj_memb = sorted(
        (r["bucket_id"], r["metric"], r["series"])
        for r in res.membership.filter("is_obj").collect()
    )
    heap = ("tidb_heap_size:by_instance", "172.17.16.11:10080")
    assert obj_memb == sorted(
        [(b, *heap) for b in (0, 1, 4, 5, 7, 9, 10)]
        + [
            (0, "tidb_p99_rt:total", "agg_val"),
            (7, "tidb_p99_get_token_dur", "agg_val"),
            (11, "tidb_p99_get_token_dur", "agg_val"),
        ]
    )

    ranked = res.ranked.collect()
    groups = {
        (r["bucket_id"], r["obj_metric"], r["obj_series"]) for r in ranked
    }
    # every ranked group is an anomalous objective (bucket 11 drops out:
    # no co-anomalous candidate series in that slice)
    assert groups <= set(obj_memb)
    top3_rt = [
        (r["cand_metric"], r["cand_series"], r["lag"])
        for r in sorted(
            (
                r
                for r in ranked
                if (r["bucket_id"], r["obj_metric"]) == (0, "tidb_p99_rt:total")
            ),
            key=lambda r: r["rank"],
        )
    ]
    assert top3_rt == [
        ("node_disk_write_ops:by_instance:by_device", "vda:172.17.16.11:9100", -3),
        ("tikv_avg_raftstore_async_req_dur", "agg_val", 1),
        ("pd_p999_rpc_dur:tso", "agg_val", 0),
    ]
    # positional windows hold at most count_bucket samples
    assert all(r["n_pairs"] <= 40 for r in ranked)


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
