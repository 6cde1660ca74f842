"""Unit goldens for trend (regression/MAD/EWMA), range join and ranked
retrieval (TF-IDF / BM25) operators."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.text import bm25_search, tfidf_top_terms
from metrics_advisor_spark.operators.rangejoin import (
    incident_intervals,
    range_join_count,
)
from metrics_advisor_spark.operators.trend import ewma, mad_outliers, series_regression

T0 = dt.datetime(2024, 1, 1)


def _sig(spark, values, step_s=60):
    rows = [
        ("m", "s", T0 + dt.timedelta(seconds=i * step_s), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "metric string, series string, ts timestamp, value double")


def test_series_regression_matches_polyfit(spark):
    rng = np.random.default_rng(7)
    y = 0.5 + 0.001 * np.arange(200) * 60 + rng.normal(0, 0.1, 200)
    out = series_regression(_sig(spark, y)).collect()[0]
    x = np.arange(200) * 60.0
    slope, intercept = np.polyfit(x, y, 1)
    assert out.n_samples == 200
    assert out.slope_per_day == pytest.approx(slope * 86400, abs=2e-6)
    assert out.intercept == pytest.approx(intercept, abs=2e-6)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert out.r2 == pytest.approx(r2, abs=2e-6)


def test_series_regression_skips_degenerate(spark):
    # constant time axis (single point) and short series are filtered out
    assert series_regression(_sig(spark, [1.0, 2.0])).count() == 0


def test_mad_outliers_flags_spike_ksigma_misses(spark):
    # heavy contamination: two big spikes inflate σ but not the MAD
    vals = [1.0] * 40 + [50.0, 60.0]
    out = mad_outliers(_sig(spark, vals)).collect()
    assert sorted(r.value for r in out) == [50.0, 60.0]


def test_ewma_matches_reference_loop(spark):
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 30)
    out = {r.epoch: r.ewma for r in ewma(_sig(spark, vals)).collect()}
    decay, depth = 0.8, 12
    for t in range(len(vals)):
        lo = max(0, t - depth + 1)
        ws = [decay**k for k in range(t - lo + 1)]
        expect = sum(w * vals[t - k] for k, w in enumerate(ws)) / sum(ws)
        epoch = int((T0 + dt.timedelta(seconds=t * 60)).timestamp())
        assert out[epoch] == pytest.approx(expect, abs=1e-6)


def test_range_join_blocked_equals_naive(spark):
    sf_dir = "/root/testdata/sf0.001"
    from metrics_advisor_spark.sources.signals import _as_timestamp

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("ts", _as_timestamp(ev, "ts"))
    iv = incident_intervals(ev, factor=1.2)
    blocked = {r.metric: r.n_events for r in range_join_count(ev, iv).collect()}

    e = ev.select(
        F.col("event_type").alias("metric"),
        "event_id",
        F.unix_timestamp("ts").alias("epoch"),
    )
    naive = {
        r.metric: r.n
        for r in e.join(iv, "metric")
        .filter((F.col("epoch") >= F.col("lo")) & (F.col("epoch") < F.col("hi")))
        .groupBy("metric")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    assert blocked == naive and blocked


def _docs(spark):
    rows = [
        (1, "spark spark join fast"),
        (2, "join join join slow table"),
        (3, "vector spark table table"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_values_and_ranking(spark):
    out = tfidf_top_terms(_docs(spark), k=1).collect()
    top = {r.doc_id: (r.term, r.tfidf) for r in out}
    # doc 1: 'fast' tf=1 df=1 → ln(2)=0.693 beats 'spark' tf=2 df=2 →
    # 2*ln(4/3)=0.575 — rarity outweighs repetition at this ratio
    assert top[1][0] == "fast"
    assert top[1][1] == pytest.approx(math.log(2), abs=1e-6)
    assert top[2][0] == "join"  # tf=3, unique to the pair {1,2}
    assert top[3][0] == "vector"  # df=1 beats table tf=2 df=2


def test_bm25_prefers_matching_docs(spark):
    out = bm25_search(_docs(spark), ("spark", "vector")).collect()
    ranked = [r.doc_id for r in out]
    # doc 3 has both query terms; doc 2 has neither
    assert ranked[0] == 3
    assert 2 not in ranked
    assert all(r.bm25 > 0 for r in out)


def test_hll_distinct_error_bounded(spark):
    import __spark_entry__ as m

    out = m.queries()["hll_distinct"](spark, "/root/testdata/sf0.01").collect()
    assert out
    for r in out:
        # the contract row IS the bound (r08: hash-oracled error-bound
        # reshape) — every group must attest the 2% envelope
        assert r.est_within_2pct, (r.metric, r.exact_distinct)
        assert r.exact_distinct > 0


# --- degenerate inputs ------------------------------------------------------


def test_trend_ops_on_degenerate_series(spark):
    empty = spark.createDataFrame(
        [], "metric string, series string, ts timestamp, value double"
    )
    assert series_regression(empty).count() == 0
    assert mad_outliers(empty).count() == 0
    assert ewma(empty).count() == 0

    # constant series: MAD=0 and dev=0 → nothing flagged; regression has
    # sxx>0 but r is NULL (zero y-variance) → r2 NULL, row kept
    const = _sig(spark, [5.0] * 30)
    assert mad_outliers(const).count() == 0
    fit = series_regression(const).collect()[0]
    assert fit.slope_per_day == 0.0 and fit.r2 is None
    # EWMA of a constant is that constant
    assert all(r.ewma == 5.0 for r in ewma(const).collect())

    # single point: below min_points
    assert series_regression(_sig(spark, [1.0])).count() == 0
    one = ewma(_sig(spark, [7.0])).collect()
    assert len(one) == 1 and one[0].ewma == 7.0


def test_retrieval_on_degenerate_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert tfidf_top_terms(empty).count() == 0
    assert bm25_search(empty, ("spark",)).count() == 0

    # no query term present anywhere → empty result, no crash
    docs = _docs(spark)
    assert bm25_search(docs, ("zzzmissing",)).count() == 0

    # punctuation-only text tokenizes to nothing
    punct = spark.createDataFrame([(1, "!!! ??? ...")], "doc_id long, text string")
    assert tfidf_top_terms(punct).count() == 0


def test_range_join_without_incidents(spark):
    from pyspark.sql import functions as SF

    ev = spark.createDataFrame(
        [(1, "m", 1.0)], "event_id long, event_type string, value double"
    ).withColumn("ts", SF.to_timestamp(SF.lit("2024-01-01 00:00:00")))
    # factor high enough that no bucket qualifies → empty both stages
    iv = incident_intervals(ev, factor=1e9)
    assert iv.count() == 0
    assert range_join_count(ev, iv).count() == 0


def test_quantile_over_time_matches_numpy(spark):
    import numpy as np
    from metrics_advisor_spark.operators.trend import quantile_over_time

    vals = [float(v) for v in (1, 5, 2, 8, 3, 9, 4, 7, 6, 0)]
    rows = [("m", "s", 1700000000 + 60 * i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "metric string, series string, epoch long, value double"
    ).withColumn("ts", F.col("epoch").cast("timestamp")).drop("epoch")
    got = quantile_over_time(df, slot_s=3600).collect()
    # 10 samples spanning 9 min → a single 1-hour slot
    assert len(got) == 1
    r = got[0]
    assert r["n_samples"] == 10
    assert abs(r["p50"] - np.percentile(vals, 50)) < 1e-6
    assert abs(r["p95"] - np.percentile(vals, 95)) < 1e-6


def test_irate_uses_last_pair_and_handles_reset(spark):
    from metrics_advisor_spark.operators.trend import irate

    # counter: +10/min, then a reset (drop to 5) at the bucket's end
    rows = [
        ("m", "s", 0, 100.0),
        ("m", "s", 60, 110.0),
        ("m", "s", 120, 120.0),
        ("m", "s", 180, 5.0),  # reset → inc = post-reset value (5)
    ]
    df = spark.createDataFrame(
        rows, "metric string, series string, epoch long, value double"
    ).withColumn("ts", F.col("epoch").cast("timestamp")).drop("epoch")
    got = irate(df, bucket_s=600).collect()
    assert len(got) == 1  # one bucket
    assert abs(got[0]["irate_per_s"] - 5.0 / 60) < 1e-6


def test_gap_detect_finds_planted_gap(spark):
    from metrics_advisor_spark.operators.trend import gap_detect

    epochs = [0, 15, 30, 45, 120, 135]  # 75 s gap = 5 steps → 4 missing
    df = spark.createDataFrame(
        [("m", "s", e, 1.0) for e in epochs],
        "metric string, series string, epoch long, value double",
    ).withColumn("ts", F.col("epoch").cast("timestamp")).drop("epoch")
    got = gap_detect(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["epoch"], r["gap_s"], r["step_s"], r["n_missing"]) == (
        120, 75, 15, 4,
    )


def test_heavy_hitters_exact_counts(spark):
    from metrics_advisor_spark.functions.text import heavy_hitters

    docs = [
        (0, "the cat sat"),
        (1, "the dog sat sat"),
        (2, "the bird"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["term"]: r for r in heavy_hitters(df, k=10).collect()}
    assert got["the"]["df"] == 3 and got["the"]["rank"] == 1
    assert got["sat"]["df"] == 2 and got["sat"]["total_tf"] == 3
    assert got["cat"]["df"] == 1


def test_normalize_text_cleaning(spark):
    from metrics_advisor_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(0, "  Hello,   WORLD!! 42  ")], "doc_id long, text string"
    )
    r = normalize_text(df).collect()[0]
    assert r["clean_prefix"] == "hello world 42"
    assert r["n_chars_clean"] == len("hello world 42")
    assert r["n_chars_raw"] == len("  Hello,   WORLD!! 42  ")


def test_dup_cluster_sizes(spark):
    from metrics_advisor_spark.functions.dedup import dup_cluster_sizes

    # components: {1,2,3} (chain) and {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["cluster_size"]: r["n_clusters"]
           for r in dup_cluster_sizes(pairs).collect()}
    assert got == {3: 1, 2: 1}


def test_zipf_slope_on_synthetic_zipf(spark):
    """A corpus drawn EXACTLY from freq(rank) = C/rank must fit slope −1."""
    from metrics_advisor_spark.functions.text import zipf_slope

    words = []
    for rank in range(1, 51):
        words += [f"w{rank:03d}"] * (1000 // rank)
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    r = zipf_slope(df, top_n=50).collect()[0]
    assert r["n_terms"] == 50
    assert abs(r["zipf_slope"] - (-1.0)) < 0.02  # floor(1000/rank) jitter


def test_quantile_sketch_audit_error_bounded(spark):
    """The GK sketch at accuracy 10000 must sit within 1% relative rank
    of the exact p95 on the driver's events table (the same bounded-error
    contract hll_distinct carries)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.q_quantile_sketch_audit(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        # the contract row IS the bound (r08: hash-oracled error-bound
        # reshape) — every group must attest the 2% envelope
        assert r["sketch_within_2pct"], r
        assert r["p95_exact"] is not None
