"""Round-4b operators: OHLC bars, TWAP, linear interpolation, PromQL
changes/deriv, char entropy, KL novelty, token-pair counts, train/val/
test split, triangle count, MERGE upsert, gaps-and-islands."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _sig(spark, rows):
    return spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )


def test_ohlc_endpoints_and_extremes(spark):
    from metrics_advisor_spark.operators.resample import ohlc

    rows = [
        ("m", "s", _ts(10), 5.0),
        ("m", "s", _ts(20), 9.0),
        ("m", "s", _ts(30), 1.0),
        ("m", "s", _ts(40), 7.0),
        # second hour: single tick
        ("m", "s", _ts(3700), 2.0),
    ]
    out = {
        r["slot_epoch"]: r
        for r in ohlc(_sig(spark, rows), 3600, keys=("metric",)).collect()
    }
    bar = out[0]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (
        5.0, 9.0, 1.0, 7.0,
    )
    assert bar["n_ticks"] == 4
    one = out[3600]
    assert (one["open"], one["close"]) == (2.0, 2.0)


def test_ohlc_duplicate_ts_tiebreak_deterministic(spark):
    from metrics_advisor_spark.operators.resample import ohlc

    # two samples at the SAME timestamp: the (ts, value) struct order
    # must pick the smaller value as open, larger as close
    rows = [("m", "s", _ts(10), 8.0), ("m", "s", _ts(10), 3.0)]
    bar = ohlc(_sig(spark, rows), 3600, keys=("metric",)).collect()[0]
    assert bar["open"] == 3.0 and bar["close"] == 8.0


def test_twap_weights_by_holding_time(spark):
    from metrics_advisor_spark.operators.resample import time_weighted_avg

    # value 10 held for 30 s, value 20 held for 10 s, last sample
    # (value 99) has no successor → weight 0
    rows = [
        ("m", "s", _ts(0), 10.0),
        ("m", "s", _ts(30), 20.0),
        ("m", "s", _ts(40), 99.0),
    ]
    out = time_weighted_avg(_sig(spark, rows), 3600).collect()[0]
    assert abs(out["twap"] - (10.0 * 30 + 20.0 * 10) / 40) < 1e-9
    assert out["n_samples"] == 3


def test_twap_single_sample_degrades_to_value(spark):
    from metrics_advisor_spark.operators.resample import time_weighted_avg

    out = time_weighted_avg(
        _sig(spark, [("m", "s", _ts(5), 42.0)]), 3600
    ).collect()[0]
    assert out["twap"] == 42.0


def test_interpolate_fills_interior_gap_linearly(spark):
    from metrics_advisor_spark.operators.resample import interpolate_hourly

    # hourly slots 0, 3600, 7200, 10800 with 3600 and 7200 missing:
    # 0 → 0.0, 10800 → 30.0 ⇒ interpolated 10.0 and 20.0
    rows = [("m", "s", _ts(0), 0.0), ("m", "s", _ts(10800), 30.0)]
    out = {
        r["slot_epoch"]: r
        for r in interpolate_hourly(_sig(spark, rows)).collect()
    }
    assert len(out) == 4
    assert not out[0]["is_interpolated"]
    assert out[3600]["is_interpolated"]
    assert abs(out[3600]["value"] - 10.0) < 1e-9
    assert abs(out[7200]["value"] - 20.0) < 1e-9
    assert not out[10800]["is_interpolated"]


def test_changes_counts_within_bucket_only(spark):
    from metrics_advisor_spark.operators.trend import changes

    rows = [
        # bucket 0: 1 → 1 → 2 → 2 → 3  ⇒ 2 changes
        ("m", "s", _ts(0), 1.0),
        ("m", "s", _ts(10), 1.0),
        ("m", "s", _ts(20), 2.0),
        ("m", "s", _ts(30), 2.0),
        ("m", "s", _ts(40), 3.0),
        # bucket 600: first sample differs from bucket-0 tail but has no
        # in-bucket predecessor ⇒ 0 changes
        ("m", "s", _ts(600), 9.0),
    ]
    out = {
        r["bucket_epoch"]: r["n_changes"]
        for r in changes(_sig(spark, rows), 600).collect()
    }
    assert out == {0: 2, 600: 0}


def test_deriv_exact_on_linear_series(spark):
    from metrics_advisor_spark.operators.trend import deriv

    rows = [("m", "s", _ts(t), 2.5 * t + 1.0) for t in (0, 60, 120, 300)]
    out = deriv(_sig(spark, rows), 86400).collect()[0]
    assert abs(out["slope"] - 2.5) < 1e-9
    # singleton series is filtered (needs ≥ 2 samples)
    single = deriv(_sig(spark, [("m", "s", _ts(0), 1.0)]), 86400).collect()
    assert single == []


def test_char_entropy_extremes(spark):
    from metrics_advisor_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "  123  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0  # single symbol ⇒ zero entropy
    assert abs(out[2]["entropy"] - math.log(2)) < 1e-6  # uniform over 2
    assert 3 not in out  # no letters ⇒ no row


def test_kl_zero_when_group_matches_corpus(spark):
    from metrics_advisor_spark.functions.text import kl_by_group

    # both sources have the IDENTICAL word distribution ⇒ KL = 0 each
    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "x x y")], "source string, text string"
    )
    for r in kl_by_group(df).collect():
        assert r["kl_divergence"] == 0.0
        assert r["n_tokens"] == 3
    # skewed source has strictly positive KL
    df2 = spark.createDataFrame(
        [("a", "x x x x"), ("b", "y y y y")], "source string, text string"
    )
    for r in kl_by_group(df2).collect():
        assert r["kl_divergence"] > 0.0


def test_token_pair_counts_ranking(spark):
    from metrics_advisor_spark.functions.text import token_pair_counts

    df = spark.createDataFrame(
        [(1, "new york new york"), (2, "new york city"), (3, "solo")],
        "doc_id long, text string",
    )
    out = token_pair_counts(df, top_k=10).collect()
    assert out[0]["pair"] == "new york" and out[0]["n_pairs"] == 3
    pairs = {r["pair"] for r in out}
    assert "york new" in pairs and "york city" in pairs
    assert "solo" not in " ".join(pairs).split("  ")  # 1-token doc dropped


def test_train_split_deterministic_and_partitioned(spark):
    from metrics_advisor_spark.functions.curation import train_val_test_split

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = train_val_test_split(df).groupBy("split").count().collect()
    b = train_val_test_split(df).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    counts = dict(map(tuple, a))
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["val"]  # ~80/10/10
    # membership itself is stable row-by-row, not just in aggregate
    rows = train_val_test_split(df).orderBy("doc_id").collect()
    rows2 = train_val_test_split(df).orderBy("doc_id").collect()
    assert rows == rows2


def test_triangle_count_known_graph(spark):
    from metrics_advisor_spark.functions.dedup import triangle_count

    # triangle 1-2-3 plus pendant edge 3-4 ⇒ 1 triangle, 4 edges
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    out = triangle_count(edges).collect()[0]
    assert out["n_triangles"] == 1 and out["n_edges"] == 4


def test_merge_upsert_semantics(spark):
    from metrics_advisor_spark.operators.history import merge_upsert

    base = spark.createDataFrame(
        [(1, _ts(10), "a", 1.0), (2, _ts(10), "b", 2.0), (3, _ts(10), "c", 3.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    chg = spark.createDataFrame(
        [
            # user 1: two updates — the later one wins
            (1, _ts(20), "a2", 10.0, False, 1),
            (1, _ts(30), "a3", 11.0, False, 2),
            # user 2: deleted
            (2, _ts(20), "gone", 0.0, True, 3),
            # user 4: pure insert
            (4, _ts(20), "d", 4.0, False, 4),
        ],
        "user_id long, ts timestamp, event_type string, value double,"
        " is_delete boolean, event_id long",
    )
    out = {
        r["user_id"]: r
        for r in merge_upsert(
            base, chg, order_cols=("ts", "event_id")
        ).collect()
    }
    assert set(out) == {1, 3, 4}  # 2 deleted, 3 untouched, 4 inserted
    assert out[1]["event_type"] == "a3" and out[1]["value"] == 11.0
    assert out[3]["event_type"] == "c"
    assert out[4]["value"] == 4.0


def test_interval_merge_islands(spark):
    from metrics_advisor_spark.operators.sessions import interval_merge

    ev = spark.createDataFrame(
        [
            # user 1: 0, 100, 200 merge; 5000 starts a new island
            (1, 1, _ts(0)), (2, 1, _ts(100)), (3, 1, _ts(200)),
            (4, 1, _ts(5000)),
            (5, 2, _ts(0)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = interval_merge(ev, gap_seconds=1800)
    u1 = sorted(
        [tuple(r) for r in out.where("user_id = 1").collect()],
        key=lambda t: t[1],
    )
    assert u1 == [(1, 1, 0, 200, 3), (1, 2, 5000, 5000, 1)]
    assert out.where("user_id = 2").collect()[0]["n_events"] == 1


# --- round-4c batch --------------------------------------------------------


def test_last_touch_attribution(spark):
    from metrics_advisor_spark.operators.sessions import (
        last_touch_attribution,
    )

    ev = spark.createDataFrame(
        [
            # user 1: click then purchase within window → 'click'
            (1, 1, _ts(100), "click", 0.0),
            (2, 1, _ts(200), "purchase", 10.0),
            # user 2: touch far outside the lookback → 'none'
            (3, 2, _ts(0), "view", 0.0),
            (4, 2, _ts(10 * 86400), "purchase", 5.0),
            # user 3: purchase with no history at all → 'none'
            (5, 3, _ts(100), "purchase", 1.0),
            # user 4: a LATER touch must not attribute backwards
            (6, 4, _ts(100), "purchase", 2.0),
            (7, 4, _ts(200), "click", 0.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    out = {
        r["touch_type"]: r
        for r in last_touch_attribution(ev, "purchase", 7 * 86400).collect()
    }
    assert out["click"]["n_conversions"] == 1
    assert out["click"]["total_value"] == 10.0
    assert out["none"]["n_conversions"] == 3


def test_sliding_distinct_users_window(spark):
    from metrics_advisor_spark.operators.sessions import (
        sliding_distinct_users,
    )

    # user 1 active day 0; user 2 active day 2 — with a 3-day window,
    # day 2 sees both; day 3 exceeds the data extent and is clipped
    ev = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(2 * 86400))], "user_id long, ts timestamp"
    )
    out = {
        r["report_day"]: r["active_users"]
        for r in sliding_distinct_users(ev, window_days=3).collect()
    }
    assert out == {0: 1, 86400: 1, 2 * 86400: 2}


def test_robust_scale_median_iqr(spark):
    from metrics_advisor_spark.operators.normalize import robust_scale

    rows = [("m", "s", _ts(i), float(v)) for i, v in enumerate(
        [1.0, 2.0, 3.0, 4.0, 5.0]
    )]
    out = robust_scale(_sig(spark, rows)).collect()
    # median 3, IQR = 4 − 2 = 2 → values map to −1, −.5, 0, .5, 1
    vals = sorted(r["scaled_value"] for r in out)
    assert vals == [-1.0, -0.5, 0.0, 0.5, 1.0]
    # constant series → IQR 0 → NULL, rows preserved
    const = robust_scale(
        _sig(spark, [("m", "s", _ts(0), 7.0), ("m", "s", _ts(1), 7.0)])
    ).collect()
    assert len(const) == 2 and all(r["scaled_value"] is None for r in const)


def test_typo_pairs_exact_and_no_false_positives(spark):
    from metrics_advisor_spark.functions.text import typo_pairs

    vocab = spark.createDataFrame(
        [("spark",), ("spa_k",), ("sprk",), ("sparks",), ("table",),
         ("tabel",)],
        "w string",
    )
    got = {
        (r["word_a"], r["word_b"]) for r in typo_pairs(vocab).collect()
    }
    # substitution, deletion, insertion all found
    assert ("spa_k", "spark") in got
    assert ("spark", "sprk") in got
    assert ("spark", "sparks") in got
    # transpose is distance 2 — candidate via shared variants, must be
    # rejected by the verify step
    assert ("tabel", "table") not in got
    assert all(a < b for a, b in got)


def test_burst_detect_flags_spike_bucket(spark):
    from metrics_advisor_spark.operators.trend import burst_detect

    rows = (
        [("m", "s", _ts(b * 60 + i), 1.0) for b in range(10) for i in range(2)]
        + [("m", "s", _ts(10 * 60 + i), 1.0) for i in range(40)]
    )
    out = burst_detect(
        _sig(spark, rows).drop("series"), bucket_s=60, n_sigmas=2.0
    ).collect()
    assert [r["bucket_epoch"] for r in out] == [600]
    assert out[0]["n_events"] == 40


def test_seasonal_strength_prefers_seasonal_series(spark):
    from metrics_advisor_spark.operators.trend import seasonal_strength

    # period-24 sawtooth: v(t) = t mod 24 → seasonal error 0, naive > 0
    hourly = spark.createDataFrame(
        [("m", t * 3600, float(t % 24)) for t in range(72)],
        "metric string, slot_epoch long, value double",
    )
    out = seasonal_strength(hourly, period_slots=24, slot_s=3600).collect()[0]
    assert out["seasonal_err"] == 0.0
    assert out["naive_err"] > 0
    assert out["strength_ratio"] == 0.0


def test_cross_source_overlap_counts(spark):
    from metrics_advisor_spark.functions.dedup import cross_source_overlap

    df = spark.createDataFrame(
        [
            (1, "alpha", "s1"), (2, "beta", "s1"),
            (3, "alpha", "s2"), (4, "beta", "s2"), (5, "gamma", "s2"),
            (6, "alpha", "s3"),
            # in-source repeat must not inflate the pair count
            (7, "alpha", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in cross_source_overlap(df).collect()
    }
    assert out == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


# --- round-4d batch --------------------------------------------------------


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from metrics_advisor_spark.functions.graph import pagerank

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3)]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, damping=0.85, iterations=10).collect()
    }

    # numpy reference: undirected, column-stochastic, same fixed iters
    n = 4
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[a, b] = adj[b, a] = 1.0
    deg = adj.sum(axis=1)
    m = adj / deg[:, None]  # row i spreads to neighbours
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - 0.85) / n + 0.85 * (m.T @ r)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-5
    # high-degree node 2 outranks the pendant node 3
    assert got[2] > got[3]


def test_cms_never_underestimates_and_is_exact_when_sparse(spark):
    from metrics_advisor_spark.functions.sketch import cms_estimate

    counts = spark.createDataFrame(
        [("a", 100), ("b", 10), ("c", 1)], "term string, n long"
    )
    probes = counts.select("term")
    # wide sketch: no collisions possible with 3 keys → exact
    out = {
        r["term"]: r
        for r in cms_estimate(
            counts, probes, depth=4, width=1024
        ).collect()
    }
    for t, n in (("a", 100), ("b", 10), ("c", 1)):
        assert out[t]["cms_estimate"] == out[t]["exact"] == n
    # 1-wide sketch: every row collides everything → est = total
    tight = cms_estimate(counts, probes, depth=4, width=1).collect()
    assert all(r["cms_estimate"] == 111 for r in tight)
    assert all(r["cms_estimate"] >= r["exact"] for r in tight)


def test_cms_unknown_probe_reports_zero_or_collision(spark):
    from metrics_advisor_spark.functions.sketch import cms_estimate

    counts = spark.createDataFrame([("a", 5)], "term string, n long")
    probes = spark.createDataFrame([("zzz",)], "term string")
    out = cms_estimate(counts, probes, depth=4, width=1024).collect()[0]
    assert out["exact"] == 0
    assert out["cms_estimate"] >= 0


def test_fk_violations_counts_orphans_and_nulls(spark):
    from metrics_advisor_spark.operators.quality import fk_violations

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,)], "pk long")
    out = fk_violations(child, parent, "fk", "pk", "t").collect()[0]
    assert out["n_orphans"] == 1  # fk=99
    assert out["n_null"] == 1


def test_profile_columns_single_pass(spark):
    from metrics_advisor_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, None, 4.0), (3, "x", None)],
        "id long, s string, v double",
    )
    out = {
        r["column_name"]: r
        for r in profile_columns(df, numeric_cols=("id", "v")).collect()
    }
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 3
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 1
    assert out["v"]["min_value"] == 2.0 and out["v"]["max_value"] == 4.0
    assert out["s"]["min_value"] is None  # non-numeric: no min/max


def test_rolling_corr_tracks_relationship_flip(spark):
    from metrics_advisor_spark.operators.trend import rolling_corr

    # first 10 slots: vb = va (r=1); last 10: vb = -va
    rows = [(s, float(s % 5), float(s % 5)) for s in range(10)]
    rows += [(s, float(s % 5), -float(s % 5)) for s in range(10, 20)]
    j = spark.createDataFrame(
        rows, "slot_epoch long, va double, vb double"
    )
    out = {
        r["slot_epoch"]: r["r"]
        for r in rolling_corr(j, window_slots=5).collect()
    }
    assert out[9] == 1.0  # pure positive regime
    assert out[19] == -1.0  # pure negative regime
    assert -1.0 < out[11] < 1.0  # mixed window


def test_winsorize_clips_tails_only(spark):
    from metrics_advisor_spark.operators.normalize import winsorize

    rows = [("m", "s", _ts(i), float(v)) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    )]
    out = winsorize(_sig(spark, rows), 0.1, 0.9).collect()
    clipped = [r for r in out if r["was_clipped"]]
    assert len(clipped) >= 1  # the 1000 outlier
    assert max(r["value"] for r in out) < 1000  # upper tail tamed
    assert len(out) == 10  # no rows dropped


def test_transition_counts_session_scoped(spark):
    from metrics_advisor_spark.operators.sessions import transition_counts

    ev = spark.createDataFrame(
        [
            # session 1: view → click → purchase
            (1, 1, _ts(0), "view"), (2, 1, _ts(60), "click"),
            (3, 1, _ts(120), "purchase"),
            # big gap → new session: purchase → view must NOT bridge
            (4, 1, _ts(99999), "view"), (5, 1, _ts(99999 + 60), "click"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in transition_counts(ev, gap_seconds=1800).collect()
    }
    assert out == {
        ("view", "click"): 2,
        ("click", "purchase"): 1,
    }  # no (purchase → view) across the session break


def test_pmi_positive_for_coupled_negative_for_disjoint(spark):
    import math

    from metrics_advisor_spark.operators.sessions import pmi_cooccurrence

    rows = []
    # users 1-4: always a AND b together (coupled)
    for u in range(1, 5):
        rows += [(u, "a"), (u, "b")]
    # users 5-8: c alone
    for u in range(5, 9):
        rows.append((u, "c"))
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r["type_a"], r["type_b"]): r for r in pmi_cooccurrence(ev).collect()
    }
    ab = out[("a", "b")]
    # p(a,b)=.5, p(a)=p(b)=.5 → PMI = ln(.5/.25) = ln 2
    assert abs(ab["pmi"] - math.log(2)) < 1e-6
    assert ("a", "c") not in out  # never co-occur → no pair row
